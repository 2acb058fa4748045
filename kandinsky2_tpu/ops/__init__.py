from .attention import qkv_attention
