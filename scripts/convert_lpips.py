"""Convert torchvision VGG16 + lpips 'lin' weights into an npz for
train/lpips_jax.py.

Usage:
  python scripts/convert_lpips.py vgg16.pth lpips_vgg_lins.pth out.npz
(the weight files are external downloads, as in the reference which pip-
installs `lpips`; this tool imports them once for the perceptual losses)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import torch

    from havatar_tpu.train.lpips_jax import convert_torch_lpips, save_lpips_file

    vgg_path, lin_path, out = sys.argv[1:4]
    vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=False)
    if hasattr(vgg_sd, "state_dict"):
        vgg_sd = vgg_sd.state_dict()
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=False)
    if hasattr(lin_sd, "state_dict"):
        lin_sd = lin_sd.state_dict()
    params = convert_torch_lpips(vgg_sd, lin_sd)
    save_lpips_file(params, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
