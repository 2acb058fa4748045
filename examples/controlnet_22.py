"""2.2 ControlNet-depth, full notebook flow (reference
notebooks/kandinsky2_2_controlnet.ipynb): RGB photo -> depth hint
(``kandinsky2_tpu.depth.make_hint``; reference-grade DPT depth runs
automatically when $KANDINSKY2_DPT_DIR points at a snapshot fetched via
``weights.hub.fetch_dpt`` — the heuristic is the weightless fallback) ->
emb2emb priors -> ControlNet img2img decoder.

Pass ``--image photo.jpg`` to control a real photograph; without it a small
procedural scene (sky / ground / box) is rendered so the script runs offline.
"""
import numpy as np
from common import argparser, make_pipe22

from kandinsky2_tpu.depth import make_hint


def procedural_scene(size: int):
    """A photo-like RGB test scene (not a ramp): sky gradient, ground plane,
    and a foreground box, so the depth heuristic has real structure."""
    from PIL import Image

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.zeros((size, size, 3), np.float32)
    sky = yy < 0.45
    img[..., 2] = np.where(sky, 0.9 - 0.5 * yy, 0.25)          # blue sky
    img[..., 1] = np.where(sky, 0.7 - 0.3 * yy, 0.5 + 0.3 * yy)  # ground green
    img[..., 0] = np.where(sky, 0.5 - 0.2 * yy, 0.3 + 0.2 * yy)
    box = (np.abs(xx - 0.5) < 0.12) & (yy > 0.5) & (yy < 0.8)
    img[box] = (0.7, 0.3, 0.2)
    return Image.fromarray((img * 255).astype(np.uint8))


args = argparser(image=None).parse_args()
pipe, kw = make_pipe22(args.small, task_type="controlnet")
size = kw.pop("h"), kw.pop("w")

if args.image:
    from PIL import Image

    photo = Image.open(args.image).convert("RGB").resize((size[1], size[0]))
else:
    photo = procedural_scene(size[0])

hint = make_hint(photo, h=size[0], w=size[1])

# notebook prior flow: interpolate -> emb2emb with the image embedding
clip_emb = pipe.encode_image(photo)
img_emb = pipe.run_prior_emb2emb(
    clip_emb, args.prompt, strength=0.85, prior_steps=kw.pop("prior_steps"),
)
neg_emb = pipe.get_zero_embed(1)
embs = np.concatenate([np.asarray(neg_emb), np.asarray(img_emb)], axis=0)

imgs = pipe.generate_controlnet(
    args.prompt, hint=hint, image=photo, strength=0.5,
    image_embeds=embs, h=size[0], w=size[1], **kw,
)
imgs[0].save(args.out)
print("saved", args.out, imgs[0].size)
