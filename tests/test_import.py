"""Numerical proof of the torch/MinkowskiEngine checkpoint importer.

The importer (train/import_torch.py) encodes two subtle claims:
  1. ME enumerates HYPER_CUBE kernel offsets x-INNERMOST
     (j = ix + k*iy + k^2*iz, each axis running -r..r), while
     core/coords.kernel_offsets enumerates z-innermost — so imported
     kernels are permuted along the K^3 axis;
  2. ME transpose convs SCATTER in[c] -> out[c + d] while our decoder
     GATHERS in[f + d'], so transpose kernels are additionally
     index-negated (W'[d'] = W[-d']).

These tests build a dense numpy oracle that applies raw ME-order weights
with ME's own semantics (reference model/resunet.py:38-45 conv
geometry, lib/trainer.py:162-175 checkpoint layout) and assert that
`_import_conv`-permuted weights reproduce it bit-for-bit through
sparse_conv, for k in {1, 3, 5}, normal + strided + transpose.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gcl_tpu.core.kernel_maps import ConvSpec, build_graph
from gcl_tpu.core.sparse_ops import sparse_conv
from gcl_tpu.core.types import INVALID_BATCH, map_key
from gcl_tpu.train.import_torch import _import_conv, import_state_dict


def _me_offsets(k):
    """ME HYPER_CUBE offsets in ME enumeration order (x innermost)."""
    r = k // 2
    offs = []
    for iz in range(k):
        for iy in range(k):
            for ix in range(k):
                offs.append((ix - r, iy - r, iz - r))
    return np.asarray(offs, np.int64)  # offs[j], j = ix + k*iy + k^2*iz


def _me_conv_oracle(in_coords, x, out_coords, w_me, k, scale, transpose):
    """Dense dict-based oracle with ME semantics.

    Normal conv: out[u] = sum_d in[u + d*scale] @ W_me[d].
    Transpose conv: out[c + d*scale] += in[c] @ W_me[d] (scatter).
    """
    offs = _me_offsets(k)
    cout = w_me.shape[2]
    out = np.zeros((len(out_coords), cout), np.float64)
    if not transpose:
        lut = {tuple(c): i for i, c in enumerate(in_coords)}
        for oi, c in enumerate(out_coords):
            for j, d in enumerate(offs):
                key = tuple(np.asarray(c) + d * scale)
                if key in lut:
                    out[oi] += x[lut[key]].astype(np.float64) @ w_me[j]
    else:
        lut = {tuple(c): i for i, c in enumerate(out_coords)}
        for ii, c in enumerate(in_coords):
            for j, d in enumerate(offs):
                key = tuple(np.asarray(c) + d * scale)
                if key in lut:
                    out[lut[key]] += x[ii].astype(np.float64) @ w_me[j]
    return out.astype(np.float32)


def _coords0(rng, n=48, cap=64):
    """Random level-0 voxel coords, one cloud, padded to cap."""
    raw = np.concatenate([np.zeros((n, 1), np.int64),
                          rng.randint(-5, 6, (n, 3))], axis=1)
    uniq = np.unique(raw, axis=0)
    m = len(uniq)
    coords = np.full((cap, 4), -1, np.int32)
    coords[:, 0] = int(INVALID_BATCH)
    coords[:m] = uniq
    mask = np.zeros(cap, bool)
    mask[:m] = True
    return coords, mask, m


@pytest.mark.parametrize("k", [1, 3, 5])
def test_me_import_same_level(rng, k):
    coords, mask, m = _coords0(rng)
    cap = coords.shape[0]
    cin, cout = 3, 5
    spec = ConvSpec("c", 1, 1, k)
    graph = build_graph(jnp.asarray(coords), jnp.asarray(mask), [spec],
                        {1: cap}, method="bsearch")

    w_me = rng.randn(k ** 3, cin, cout).astype(np.float32)
    x = rng.randn(cap, cin).astype(np.float32) * mask[:, None]

    oracle = _me_conv_oracle(coords[:m, 1:], x[:m], coords[:m, 1:],
                             w_me, k, 1, transpose=False)
    if k == 1:
        got = np.asarray(jnp.dot(jnp.asarray(x),
                                 jnp.asarray(w_me[0])))[:m]
    else:
        w_ours = _import_conv(w_me, transpose=False)
        rk = map_key(1, 1, k, 1)
        got = np.asarray(sparse_conv(jnp.asarray(x), jnp.asarray(w_ours),
                                     graph.kmaps[spec.key],
                                     graph.kmaps.get(rk)))[:m]
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
def test_me_import_strided_down(rng, k):
    """Encoder conv: stride-2 downsample, offsets in input-stride units
    (ME conv semantics; reference model/resunet.py:52-60)."""
    coords, mask, m = _coords0(rng)
    cap = coords.shape[0]
    cin, cout = 2, 4
    spec = ConvSpec("c", 1, 2, k)
    graph = build_graph(jnp.asarray(coords), jnp.asarray(mask), [spec],
                        {1: cap, 2: cap}, method="bsearch")
    lv2 = graph.levels[2]
    m2 = int(np.asarray(lv2.mask).sum())
    out_coords = np.asarray(lv2.coords)[:m2, 1:]

    w_me = rng.randn(k ** 3, cin, cout).astype(np.float32)
    x = rng.randn(cap, cin).astype(np.float32) * mask[:, None]
    oracle = _me_conv_oracle(coords[:m, 1:], x[:m], out_coords,
                             w_me, k, 1, transpose=False)
    w_ours = _import_conv(w_me, transpose=False)
    rk = map_key(2, 1, k, 1)
    got = np.asarray(sparse_conv(jnp.asarray(x), jnp.asarray(w_ours),
                                 graph.kmaps[spec.key],
                                 graph.kmaps.get(rk)))[:m2]
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
def test_me_import_transpose_up(rng, k):
    """Decoder conv: stride 2 -> 1 transpose; ME scatters
    out[c + d] += in[c] @ W[d] (offsets in out-stride units), we gather
    with index-negated kernels (core/kernel_maps.py:18-20)."""
    coords, mask, m = _coords0(rng)
    cap = coords.shape[0]
    cin, cout = 2, 4
    spec = ConvSpec("c", 2, 1, k)
    graph = build_graph(jnp.asarray(coords), jnp.asarray(mask), [spec],
                        {1: cap, 2: cap}, method="bsearch")
    lv2 = graph.levels[2]
    m2 = int(np.asarray(lv2.mask).sum())
    in_coords = np.asarray(lv2.coords)[:m2, 1:]

    w_me = rng.randn(k ** 3, cin, cout).astype(np.float32)
    x2 = rng.randn(cap, cin).astype(np.float32) \
        * np.asarray(lv2.mask)[:, None]
    oracle = _me_conv_oracle(in_coords, x2[:m2], coords[:m, 1:],
                             w_me, k, 1, transpose=True)
    w_ours = _import_conv(w_me, transpose=True)
    rk = map_key(1, 2, k, 1)
    got = np.asarray(sparse_conv(jnp.asarray(x2), jnp.asarray(w_ours),
                                 graph.kmaps[spec.key],
                                 graph.kmaps.get(rk)))[:m]
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-4)


def test_full_fatbn_pth_roundtrip(tmp_path):
    """Full-model proof over a complete ResUNetFatBN .pth-shaped
    checkpoint (ref lib/trainer.py:162-175 layout): every conv kernel —
    encoder, decoder transpose convs, block convs, 1x1 final/conv1_tr —
    plus BN affine + running stats must come back from
    load_torch_checkpoint exactly as the per-conv oracle transform
    prescribes, with the transpose flag derived independently from the
    conv-spec stride geometry (decoder = in_stride > out_stride), and
    the restored model must run forward finite."""
    import jax
    import torch

    from gcl_tpu.models.resunet import ResUNetFatBN
    from gcl_tpu.train import checkpoint as ckpt
    from gcl_tpu.train.import_torch import load_torch_checkpoint

    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    by_name = {sp.name: sp for sp in specs}

    rng_np = np.random.RandomState(0)
    cap = 128
    coords = np.zeros((cap, 4), np.int32)
    coords[:, 1:] = rng_np.randint(-4, 5, (cap, 3))
    coords[:, 1] += np.arange(cap) * 9  # unique
    g = build_graph(jnp.asarray(coords),
                    jnp.asarray(np.ones(cap, bool)), specs,
                    {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g,
                           jnp.ones((cap, 1)), train=False)

    sd = {}
    expected = {"params": {}, "batch_stats": {}}

    def put(tree, names, arr):
        node = tree
        for n in names[:-1]:
            node = node.setdefault(n, {})
        node[names[-1]] = arr

    def conv_transpose_flag(names):
        if len(names) > 2:  # blockN.convI — always same-level
            return False
        sp = by_name.get(names[0])
        assert sp is not None, names
        return sp.in_stride > sp.out_stride

    def leaf_to_sd(path, leaf):
        names = [p.key for p in path]
        arr = rng_np.randn(*leaf.shape).astype(np.float32)
        if names[-1] == "kernel":
            sd[".".join(names)] = arr
            want = (_import_conv(arr, conv_transpose_flag(names))
                    if arr.ndim == 3 else arr)
            put(expected["params"], names, want)
        elif names[-1] == "bias" and "norm" not in names[-2]:
            sd[".".join(names)] = arr
            put(expected["params"], names, arr)
        else:  # norm scale/bias
            key = "weight" if names[-1] == "scale" else "bias"
            sd[".".join(names[:-1]) + ".bn." + key] = arr
            put(expected["params"], names, arr)
        return leaf

    jax.tree_util.tree_map_with_path(leaf_to_sd, variables["params"])

    def stats_to_sd(path, leaf):
        names = [p.key for p in path]
        key = {"mean": "running_mean", "var": "running_var"}[names[-1]]
        arr = rng_np.rand(*leaf.shape).astype(np.float32) + 0.5
        sd[".".join(names[:-1]) + ".bn." + key] = arr
        put(expected["batch_stats"], names, arr)
        return leaf

    jax.tree_util.tree_map_with_path(stats_to_sd,
                                     variables["batch_stats"])

    pth = tmp_path / "checkpoint.pth"
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()},
                "epoch": 7, "best_val": 0.5, "best_val_epoch": 6,
                "best_val_metric": "feat_match_ratio"}, str(pth))

    params, stats, meta = load_torch_checkpoint(str(pth))
    assert meta["epoch"] == 7
    restored = ckpt.restore_into(variables["params"], params)
    restored_stats = ckpt.restore_into(variables["batch_stats"], stats)

    flat_got, _ = jax.tree_util.tree_flatten_with_path(restored)
    flat_want = dict(jax.tree_util.tree_flatten_with_path(
        expected["params"])[0])
    assert len(flat_got) == len(flat_want)
    for path, got in flat_got:
        np.testing.assert_array_equal(
            np.asarray(got), flat_want[path],
            err_msg=str(jax.tree_util.keystr(path)))
    for path, got in jax.tree_util.tree_flatten_with_path(
            restored_stats)[0]:
        np.testing.assert_array_equal(
            np.asarray(got),
            dict(jax.tree_util.tree_flatten_with_path(
                expected["batch_stats"])[0])[path],
            err_msg=str(jax.tree_util.keystr(path)))

    out = model.apply({"params": restored,
                       "batch_stats": restored_stats}, g,
                      jnp.ones((cap, 1)), train=False)
    assert bool(jnp.all(jnp.isfinite(out))), "non-finite forward"


def test_import_state_dict_structure():
    """A synthetic reference state_dict (ResUNetBN2C names/shapes,
    lib/trainer.py:162-175) must land in a tree restore_into accepts
    against real model-init params."""
    import jax

    from gcl_tpu.models.resunet import ResUNetBN2C
    from gcl_tpu.train import checkpoint as ckpt

    model = ResUNetBN2C(1, 16, bn_momentum=0.05, normalize_feature=True,
                        conv1_kernel_size=3, D=3)
    specs = ResUNetBN2C.conv_specs(3)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    cap = 64
    coords = np.zeros((cap, 4), np.int32)
    coords[:, 1] = np.arange(cap)
    g = build_graph(jnp.asarray(coords),
                    jnp.asarray(np.ones(cap, bool)), specs,
                    {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g,
                           jnp.ones((cap, 1)), train=False)

    rng = np.random.RandomState(0)
    sd = {}

    def leaf_to_sd(path, leaf):
        # build the torch-style name for this flax param
        names = [p.key for p in path]
        arr = rng.randn(*leaf.shape).astype(np.float32)
        if names[-1] == "kernel":
            sd[".".join(names)] = arr
        elif names[-1] in ("scale", "bias") and "norm" in names[-2]:
            key = "weight" if names[-1] == "scale" else "bias"
            sd[".".join(names[:-1]) + ".bn." + key] = arr
        elif names[-1] == "bias":
            sd[".".join(names)] = arr
        return arr

    jax.tree_util.tree_map_with_path(leaf_to_sd, variables["params"])

    def stats_to_sd(path, leaf):
        names = [p.key for p in path]
        key = {"mean": "running_mean", "var": "running_var"}[names[-1]]
        arr = rng.rand(*leaf.shape).astype(np.float32) + 0.5
        sd[".".join(names[:-1]) + ".bn." + key] = arr
        return arr

    jax.tree_util.tree_map_with_path(stats_to_sd,
                                     variables["batch_stats"])

    params, stats = import_state_dict(sd)
    restored = ckpt.restore_into(variables["params"], params)
    restored_stats = ckpt.restore_into(variables["batch_stats"], stats)
    # every leaf must have been replaced (shapes match, no silent skips)
    ok = jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, variables["params"], restored)
    assert all(jax.tree_util.tree_leaves(ok))
    assert all(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, variables["batch_stats"],
        restored_stats)))
