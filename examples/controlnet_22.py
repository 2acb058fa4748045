"""2.2 ControlNet-depth (reference notebooks/kandinsky2_2_controlnet.ipynb).
The hint is any [H, W, 3] float array in [0, 1] (e.g. MiDaS depth)."""
import numpy as np
from common import argparser, make_pipe22

args = argparser().parse_args()
pipe, kw = make_pipe22(args.small, task_type="controlnet")
size = kw["h"]
yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
hint = np.stack([yy, xx, (yy + xx) / 2], -1)  # synthetic depth ramp
imgs = pipe.generate_controlnet(args.prompt, hint, **kw)
imgs[0].save(args.out)
print("saved", args.out, imgs[0].size)
