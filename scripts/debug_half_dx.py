"""Debug: _conv_half_fwd over an UP map (reverse of a stride-2 down
conv) vs the classic kernel — locate mismatching rows.

Usage: python -u scripts/debug_half_dx.py [n_points]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from gcl_tpu.core import pallas_conv
    from gcl_tpu.core.kernel_maps import ConvSpec, build_graph
    from gcl_tpu.core.types import INVALID_BATCH, map_key

    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    rng = np.random.RandomState(0)
    pts = rng.randint(-30, 30, size=(n_req, 2))
    z = rng.randint(-16, 16, size=(n_req, 1))
    xyz = np.unique(np.concatenate([pts, z], axis=1), axis=0)
    xyz = xyz[np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))]
    n = len(xyz)
    cap = -(-n // 256) * 256 + 256
    coords = np.full((cap, 4), -1, np.int32)
    coords[:, 0] = int(INVALID_BATCH)
    coords[:n, 0] = 0
    coords[:n, 1:] = xyz
    mask = np.zeros(cap, bool)
    mask[:n] = True

    spec = ConvSpec("d", 1, 2, 3)
    caps = {1: cap, 2: cap}
    g = build_graph(jnp.asarray(coords), jnp.asarray(mask), [spec],
                    caps, method="fused", sorted_blocks=True, n_clouds=1)
    rk = map_key(2, 1, 3, 1)
    rfm = g.fused[rk]  # UP map: queries level1 -> targets level2
    n2 = g.levels[2].coords.shape[0]
    cin = 64
    feats2 = (rng.randn(n2, cin).astype(np.float32)
              * np.asarray(g.levels[2].mask)[:, None])
    w = rng.randn(27, cin, cin).astype(np.float32) * 0.05

    def run(half):
        pallas_conv.HALF = half
        import os
        interp = os.environ.get("JAX_PLATFORMS") == "cpu"
        f = jax.jit(lambda x, ww: pallas_conv.fused_conv_fwd(
            x.astype(jnp.bfloat16), ww.astype(jnp.bfloat16), rfm.qkey,
            rfm.starts, rfm.nch, rfm.tkeys, win=rfm.win,
            rows=rfm.rows, hstarts=rfm.hstarts, hnch=rfm.hnch,
            hwin=rfm.hwin, interpret=interp))
        return np.asarray(f(jnp.asarray(feats2), jnp.asarray(w)),
                          np.float32)

    a = run(True)
    b = run(False)
    # ground truth vs CLASSIC: is the latent bound bug already there?
    from gcl_tpu.core.kernel_maps import _build_kmap, kernel_offsets
    km0 = np.asarray(_build_kmap(g.levels[1], g.levels[2], 2,
                                 kernel_offsets(3)))
    xp = np.concatenate([np.asarray(feats2, np.float32),
                         np.zeros((1, cin), np.float32)])
    idx0 = np.where(km0 < 0, feats2.shape[0], km0)
    ref = sum(xp[idx0[kk]] @ w[kk] for kk in range(27))
    for nm, o in (("half", a), ("classic", b)):
        err = np.abs(o - ref).max() / np.abs(ref).max()
        nbad = (np.abs(o - ref).max(axis=1)
                > 0.05 * np.abs(ref).max()).sum()
        print(f"{nm} vs ground truth: rel {err:.3e} bad rows {nbad}")
    err = np.abs(a - b).max(axis=1)
    bad = np.where(err > 0.05 * (np.abs(b).max() + 1e-9))[0]
    print("n1cap", rfm.qkey.shape[1], "bad rows:", len(bad))
    if len(bad):
        tiles = np.unique(bad // 256)
        print("bad tiles:", tiles[:20], "...")
        print("bad rows mod 256 range:",
              (bad % 256).min(), (bad % 256).max())
        print("halves hit:", np.unique((bad % 256) // 128))
        hs = np.asarray(rfm.hstarts)
        hn = np.asarray(rfm.hnch)
        for t in tiles[:6]:
            print(f"tile {t}: hstarts {hs[:, t]} hnch {hn[:, t]} "
                  f"win_h={rfm.hwin}")
        # replica rows involved
        print("replica r of bad (g0,h0):",
              np.unique((hs[0, tiles] >> 4) & 7))
        mx = hn.max(axis=0)
        bad_tiles = set(tiles.tolist())
        bad1 = [t for t in tiles if mx[t] <= 1]
        good_multi = [t for t in range(hn.shape[1])
                      if mx[t] > 1 and t not in bad_tiles]
        print(f"bad tiles with all hnch<=1: {len(bad1)} {bad1[:10]}")
        print(f"multichunk tiles that are OK: {len(good_multi)}"
              f" {good_multi[:10]}")
    else:
        print("EXACT")
    if len(bad):
        # ground truth: explicit map of the same reverse spec
        from gcl_tpu.core.kernel_maps import _build_kmap, kernel_offsets
        offs = kernel_offsets(3) * 1  # rev spec offset_scale?
        rspec_offs = offs
        km = np.asarray(_build_kmap(g.levels[1], g.levels[2], 2,
                                    rspec_offs))  # [27, n1cap]
        hs = np.asarray(rfm.hstarts); hn = np.asarray(rfm.hnch)
        r0 = int(bad[0]); t = r0 // 256; h = (r0 % 256) // 128
        print("row", r0, "tile", t, "half", h)
        for kk in range(27):
            tgt = km[kk, r0]
            if tgt < 0:
                continue
            gi = kk // 9
            row = 2 * gi + h
            s0 = hs[row, t]; nc = hn[row, t]
            cover = (s0 <= tgt < s0 + nc * rfm.hwin)
            print(f"  k={kk} g={gi} tgt_row={tgt} win=[{s0},"
                  f"{s0 + nc * rfm.hwin}) covered={cover}")



if __name__ == "__main__":
    main()
