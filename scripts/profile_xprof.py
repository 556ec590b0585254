"""Capture + analyze an XLA device trace of the GCL train step.

Two modes:

  python -u scripts/profile_xprof.py capture [outdir]
      Runs the bench.py train step (warm-up compile, then 3 traced
      steps) under jax.profiler.trace. Trace lands in
      outdir (default /tmp/xprof).

  python -u scripts/profile_xprof.py report [outdir]
      Parses the newest .xplane.pb under outdir with the pure-Python
      reader (gcl_tpu.utils.xplane) and prints, per device plane/line:
      top ops by total duration, category rollups, and the largest
      inter-op gaps (stall windows).

The report needs no TF/tensorboard — the installed plugin converters
are ABI-broken against the baked TF; see gcl_tpu/utils/xplane.py.
"""
import collections
import glob
import json
import os
import sys

sys.path.insert(0, ".")


def capture(outdir: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import synth_lidar
    from gcl_tpu.core.kernel_maps import build_graph, default_level_caps
    from gcl_tpu.losses.gcl import GCLLossConfig
    from gcl_tpu.models.resunet import ResUNetFatBN
    from gcl_tpu.train.steps import (StepConfig, TrainState,
                                     make_gcl_train_step)

    b, n_clouds = 4, 7
    p_cap, nv_cap = 65536, 18432
    model = ResUNetFatBN(1, 32, bn_momentum=0.05, normalize_feature=True,
                         conv1_kernel_size=5, D=3)
    specs = ResUNetFatBN.conv_specs(5)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    cfg = StepConfig(voxel_size=0.3, nv_cap=nv_cap,
                     level_caps=default_level_caps(
                         b * n_clouds * nv_cap, strides, 0.55),
                     knn_chunk=1024, pos_pair_cap=1 << 21,
                     search_cell=1.08, compute_dtype=jnp.bfloat16)
    tx, step = make_gcl_train_step(
        model, specs, cfg, GCLLossConfig(block_finest_gradient=False),
        "finest", max_pos_cluster=256 * b, max_hn_samples=256 * b,
        pos_weight=1.0, finest_weight=1.0, neg_weight=1.0)
    cap = 64
    coords = np.zeros((cap, 4), np.int32)
    coords[:, 1] = np.arange(cap)
    g0 = build_graph(jnp.asarray(coords),
                     jnp.asarray(np.ones(cap, bool)),
                     specs, {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g0,
                           jnp.ones((cap, 1)), train=False)
    state = TrainState(variables["params"], variables["batch_stats"],
                       tx.init(variables["params"]),
                       jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
    rng = np.random.RandomState(0)
    points = np.zeros((b, n_clouds, p_cap, 3), np.float32)
    for i in range(b):
        for c in range(n_clouds):
            points[i, c] = synth_lidar(rng, p_cap)
    pmask = np.ones((b, n_clouds, p_cap), bool)
    transforms = np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (b, n_clouds, 4, 4)).copy()
    for i in range(b):
        for c in range(1, n_clouds):
            transforms[i, c, :3, 3] = [((c + 1) // 2) * 8.0
                                       * (1 if c % 2 else -1), 0, 0]
    radius = np.full((b,), 0.45, np.float32)
    args = (jnp.asarray(points), jnp.asarray(pmask),
            jnp.asarray(transforms), jnp.asarray(radius))

    state, metrics = step(state, 0.1, *args)
    _ = float(metrics["loss"])  # force sync (axon block caveat)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, metrics = step(state, 0.1, *args)
        _ = float(metrics["loss"])
    print(f"trace written under {outdir}")


def _fmt_ms(ps: int) -> float:
    return round(ps / 1e9, 3)


def report(outdir: str, top: int = 40) -> None:
    from gcl_tpu.utils.xplane import parse_xspace

    paths = sorted(glob.glob(os.path.join(
        outdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print(f"no .xplane.pb under {outdir}")
        return
    path = paths[-1]
    print(f"# {path}")
    for plane in parse_xspace(path):
        if not any(line.events for line in plane.lines):
            continue
        print(f"\n== plane: {plane.name}")
        for line in plane.lines:
            # the 'python' line is the host callstack sampler — noise
            if not line.events or line.name == "python":
                continue
            total = sum(e.duration_ps for e in line.events)
            span = (max(e.offset_ps + e.duration_ps
                        for e in line.events)
                    - min(e.offset_ps for e in line.events))
            print(f"\n-- line: {line.name}  events={len(line.events)} "
                  f"busy={_fmt_ms(total)}ms span={_fmt_ms(span)}ms "
                  f"util={total / max(span, 1):.2f}")
            agg = collections.defaultdict(lambda: [0, 0])
            cat = collections.defaultdict(int)
            scope = collections.defaultdict(int)
            for e in line.events:
                agg[e.name][0] += e.duration_ps
                agg[e.name][1] += 1
                c = e.stats.get("hlo_category")
                if isinstance(c, str):
                    cat[c] += e.duration_ps
                # steps.py wraps pipeline phases in jax.named_scope, which
                # prefixes op names ("voxelize/sort.1") — roll up by the
                # first path segment
                seg = e.name.split("/", 1)[0] if "/" in e.name else "(none)"
                scope[seg] += e.duration_ps
            if len(scope) > 1:
                print("   named scopes:")
                for name, ps in sorted(scope.items(),
                                       key=lambda kv: -kv[1])[:15]:
                    print(f"     {_fmt_ms(ps):>10}ms  {name}")
            if cat:
                print("   categories:")
                for name, ps in sorted(cat.items(),
                                       key=lambda kv: -kv[1]):
                    print(f"     {_fmt_ms(ps):>10}ms  {name}")
            for name, (ps, n) in sorted(agg.items(),
                                        key=lambda kv: -kv[1][0])[:top]:
                print(f"   {_fmt_ms(ps):>10}ms  x{n:<5} {name[:110]}")
            # largest gaps (idle windows) between consecutive ops
            evs = sorted(line.events, key=lambda e: e.offset_ps)
            gaps = []
            end = None
            for e in evs:
                if end is not None and e.offset_ps > end:
                    gaps.append((e.offset_ps - end, end, e.name))
                end = max(end or 0, e.offset_ps + e.duration_ps)
            gaps.sort(reverse=True)
            if gaps:
                gtot = sum(g for g, *_ in gaps)
                print(f"   gaps: total={_fmt_ms(gtot)}ms; largest:")
                for g, at, nxt in gaps[:10]:
                    print(f"     {_fmt_ms(g):>10}ms before {nxt[:80]}")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "report"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof"
    if mode == "capture":
        capture(outdir)
    elif mode == "report":
        report(outdir)
    else:
        raise SystemExit(json.dumps({"error": f"unknown mode {mode}"}))


if __name__ == "__main__":
    main()
