"""Convert the public SuperPoint checkpoint (superpoint_v1.pth, MagicLeap
naming) to the splatloc_tpu npz layout.

Run wherever the checkpoint is available:
    python tools/convert_superpoint.py superpoint_v1.pth weights/superpoint.npz

Torch conv weights [out,in,kh,kw] -> HWIO.
"""
import sys

import numpy as np
import torch

_MAP = {  # torch module name -> our name
    "conv1a": "conv1a", "conv1b": "conv1b", "conv2a": "conv2a",
    "conv2b": "conv2b", "conv3a": "conv3a", "conv3b": "conv3b",
    "conv4a": "conv4a", "conv4b": "conv4b",
    "convPa": "convPa", "convPb": "convPb",
    "convDa": "convDa", "convDb": "convDb",
}


def convert(sd: dict) -> dict:
    """MagicLeap superpoint_v1 state_dict -> splatloc_tpu param arrays.
    Layout proven round-trip in tests/test_converters.py against a torch
    forward with the same weights."""
    out = {}
    for tname, oname in _MAP.items():
        w = sd[f"{tname}.weight"].detach().numpy()
        b = sd[f"{tname}.bias"].detach().numpy()
        out[f"{oname}_w"] = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        out[f"{oname}_b"] = b
    return out


def main(src, dst):
    sd = torch.load(src, map_location="cpu")
    out = convert(sd)
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
