"""2.1 image/text mixing (reference notebooks/kandinsky_2_1_mixing.ipynb)."""
from common import argparser, make_pipe21, random_image

args = argparser().parse_args()
pipe, kw = make_pipe21(args.small)
imgs = pipe.mix_images([args.prompt, random_image(64)], [0.5, 0.5], **kw)
imgs[0].save(args.out)
print("saved", args.out, imgs[0].size)
