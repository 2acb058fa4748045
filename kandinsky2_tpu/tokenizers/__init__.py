from .clip_bpe import CLIPBPETokenizer
