"""Import reference (.pth, MinkowskiEngine) checkpoints into this
framework's parameter tree.

Reference checkpoints (lib/trainer.py:162-175) store an ME state_dict:
  convN.kernel            [K^3, Cin, Cout]  (per-offset matrices)
  convN_tr.kernel         [K^3, Cin, Cout]  (transpose convs)
  conv1_tr.kernel/final.kernel [Cin, Cout]  (1x1 convs)
  final.bias              [Cout]
  normN.bn.{weight,bias,running_mean,running_var,num_batches_tracked}
  blockN.{conv1,conv2}.kernel, blockN.{norm1,norm2}.{...}

Offset-order note: ME enumerates HYPER_CUBE kernel offsets with the first
coordinate varying fastest (x innermost); this framework enumerates with z
innermost (core/coords.py:kernel_offsets). Importing therefore permutes
the K^3 axis; transpose-conv kernels are additionally index-negated
because our decoder gathers in[f + d] where ME scatters in[c] -> c + d
(core/kernel_maps.py module docstring).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _me_offset_permutation(k: int, flip: bool) -> np.ndarray:
    """perm[i_ours] = index in ME enumeration of our i-th offset."""
    r = range(k)
    # ours: i = iz + k*iy + k^2*ix  (x outermost)
    # ME:   j = ix + k*iy + k^2*iz  (x innermost)
    perm = np.zeros(k ** 3, np.int64)
    for ix in r:
        for iy in r:
            for iz in r:
                i_ours = iz + k * iy + k * k * ix
                jx, jy, jz = (k - 1 - ix, k - 1 - iy, k - 1 - iz) if flip \
                    else (ix, iy, iz)
                perm[i_ours] = jx + k * jy + k * k * jz
    return perm


def _import_conv(kernel: np.ndarray, transpose: bool) -> np.ndarray:
    if kernel.ndim == 2:  # 1x1 conv
        return kernel
    k = round(kernel.shape[0] ** (1 / 3))
    assert k ** 3 == kernel.shape[0], kernel.shape
    perm = _me_offset_permutation(k, flip=transpose)
    return kernel[perm]


def _bn(prefix: str, sd: Dict):
    """ME BatchNorm state -> (scale, bias, mean, var)."""
    for probe in (f"{prefix}.bn.", f"{prefix}."):
        if probe + "weight" in sd:
            return (sd[probe + "weight"], sd[probe + "bias"],
                    sd[probe + "running_mean"], sd[probe + "running_var"])
    raise KeyError(prefix)


def import_state_dict(sd: Dict[str, np.ndarray]):
    """Map a torch state_dict (tensor values already numpy) to
    (params, batch_stats) pytrees matching our flax module names."""
    params: Dict = {}
    stats: Dict = {}

    convs = sorted({k.split(".")[0] for k in sd if ".kernel" in k
                    and not k.startswith("block")})
    for name in convs:
        transpose = name.endswith("_tr") and name != "conv1_tr" \
            or name == "conv1_tr_extra"
        # conv1_tr in ResUNet is a 1x1 *regular* conv (reference :153-160)
        entry = {"kernel": _import_conv(np.asarray(sd[f"{name}.kernel"]),
                                        transpose)}
        if f"{name}.bias" in sd:
            entry["bias"] = np.asarray(sd[f"{name}.bias"])
        params[name] = entry

    norms = sorted({k.split(".")[0] for k in sd
                    if k.startswith("norm") and "weight" in k})
    for name in norms:
        w, b, m, v = _bn(name, sd)
        params[name] = {"scale": np.asarray(w), "bias": np.asarray(b)}
        stats[name] = {"mean": np.asarray(m), "var": np.asarray(v)}

    blocks = sorted({k.split(".")[0] for k in sd if k.startswith("block")})
    for name in blocks:
        bp: Dict = {}
        bs: Dict = {}
        for i in (1, 2):
            bp[f"conv{i}"] = {"kernel": _import_conv(
                np.asarray(sd[f"{name}.conv{i}.kernel"]), False)}
            try:
                w, b, m, v = _bn(f"{name}.norm{i}", sd)
                bp[f"norm{i}"] = {"scale": np.asarray(w),
                                  "bias": np.asarray(b)}
                bs[f"norm{i}"] = {"mean": np.asarray(m),
                                  "var": np.asarray(v)}
            except KeyError:
                pass  # IN blocks have no affine/running state
        params[name] = bp
        if bs:
            stats[name] = bs
    return params, stats


def load_torch_checkpoint(path: str):
    """Read a reference .pth and return (params, batch_stats, meta)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in ckpt["state_dict"].items()
          if "num_batches_tracked" not in k}
    params, stats = import_state_dict(sd)
    meta = {k: ckpt.get(k) for k in ("epoch", "best_val", "best_val_epoch",
                                     "best_val_metric")}
    return params, stats, meta
