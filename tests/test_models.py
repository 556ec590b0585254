"""Model zoo tests: construction, forward invariances, registry parity.

No reference implementation is runnable here (MinkowskiEngine is CUDA-only),
so correctness is established through structural invariants that ME sparse
networks satisfy by construction:
  * padding invariance — growing the capacity must not change valid outputs
  * permutation equivariance — voxel order is irrelevant
  * translation equivariance — shifting all coords by a constant multiple
    of the coarsest stride leaves features unchanged
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcl_tpu.core import INVALID_BATCH, build_graph, default_level_caps
from gcl_tpu.models import load_model
from gcl_tpu.models.resunet import ResUNetBN2C, ResUNetFatBN


def make_batch(rng, n=100, cap=256, n_clouds=2, span=20):
    rows = []
    for b in range(n_clouds):
        c = np.unique(rng.randint(-span, span, size=(n, 3)), axis=0)[:n]
        rows.append(np.concatenate(
            [np.full((len(c), 1), b), c], 1).astype(np.int32))
    coords = np.concatenate(rows)
    n_valid = len(coords)
    assert n_valid <= cap
    out = np.full((cap, 4), -1, np.int32)
    out[:, 0] = int(INVALID_BATCH)
    out[:n_valid] = coords
    mask = np.zeros(cap, bool)
    mask[:n_valid] = True
    feats = np.zeros((cap, 1), np.float32)
    feats[:n_valid] = 1.0
    return out, mask, feats, n_valid


def init_and_run(model_cls, coords, mask, feats, train=False, ckey=3):
    model = model_cls(1, 16, bn_momentum=0.05, normalize_feature=True,
                      conv1_kernel_size=ckey, D=3)
    specs = model_cls.conv_specs(ckey)
    strides = sorted({s for sp in specs for s in (sp.in_stride, sp.out_stride)})
    caps = default_level_caps(coords.shape[0], strides, shrink=0.8)
    g = build_graph(jnp.asarray(coords), jnp.asarray(mask), specs, caps)
    variables = model.init(jax.random.PRNGKey(0), g, jnp.asarray(feats),
                           train=False)
    if train:
        out, updates = model.apply(variables, g, jnp.asarray(feats),
                                   train=True, mutable=["batch_stats"])
        return model, variables, out, updates
    out = model.apply(variables, g, jnp.asarray(feats), train=False)
    return model, variables, out, None


class TestResUNet:
    def test_forward_shapes_and_norm(self, rng):
        coords, mask, feats, n = make_batch(rng)
        _, _, out, _ = init_and_run(ResUNetBN2C, coords, mask, feats)
        out = np.asarray(out)
        assert out.shape == (coords.shape[0], 16)
        # normalize_feature=True -> unit rows on valid voxels
        np.testing.assert_allclose(
            np.linalg.norm(out[:n], axis=1), 1.0, rtol=1e-4)
        assert np.isfinite(out).all()

    def test_batch_stats_update(self, rng):
        coords, mask, feats, n = make_batch(rng)
        model, variables, out, updates = init_and_run(
            ResUNetBN2C, coords, mask, feats, train=True)
        before = variables["batch_stats"]["norm1"]["mean"]
        after = updates["batch_stats"]["norm1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_padding_invariance(self, rng):
        coords, mask, feats, n = make_batch(rng, cap=256)
        model, variables, out1, _ = init_and_run(
            ResUNetFatBN, coords, mask, feats)
        # same voxels, larger capacity
        cap2 = 400
        coords2 = np.full((cap2, 4), -1, np.int32)
        coords2[:, 0] = int(INVALID_BATCH)
        coords2[:256] = coords
        mask2 = np.zeros(cap2, bool)
        mask2[:256] = mask
        feats2 = np.zeros((cap2, 1), np.float32)
        feats2[:256] = feats
        specs = ResUNetFatBN.conv_specs(3)
        strides = sorted({s for sp in specs
                          for s in (sp.in_stride, sp.out_stride)})
        caps = default_level_caps(cap2, strides, shrink=0.8)
        g2 = build_graph(jnp.asarray(coords2), jnp.asarray(mask2), specs,
                         caps)
        out2 = model.apply(variables, g2, jnp.asarray(feats2), train=False)
        np.testing.assert_allclose(np.asarray(out1)[:n],
                                   np.asarray(out2)[:n], atol=5e-4)

    def test_permutation_equivariance(self, rng):
        coords, mask, feats, n = make_batch(rng)
        model, variables, out1, _ = init_and_run(
            ResUNetBN2C, coords, mask, feats)
        perm = rng.permutation(n)
        coords2 = coords.copy()
        coords2[:n] = coords[:n][perm]
        feats2 = feats.copy()
        feats2[:n] = feats[:n][perm]
        specs = ResUNetBN2C.conv_specs(3)
        strides = sorted({s for sp in specs
                          for s in (sp.in_stride, sp.out_stride)})
        caps = default_level_caps(coords.shape[0], strides, shrink=0.8)
        g2 = build_graph(jnp.asarray(coords2), jnp.asarray(mask), specs,
                         caps)
        out2 = model.apply(variables, g2, jnp.asarray(feats2), train=False)
        np.testing.assert_allclose(np.asarray(out1)[:n][perm],
                                   np.asarray(out2)[:n], atol=5e-4)

    def test_translation_equivariance(self, rng):
        coords, mask, feats, n = make_batch(rng)
        model, variables, out1, _ = init_and_run(
            ResUNetBN2C, coords, mask, feats)
        shift = np.array([0, 8, -16, 8], np.int32)  # multiple of stride 8
        coords2 = coords.copy()
        coords2[:n] += shift
        specs = ResUNetBN2C.conv_specs(3)
        strides = sorted({s for sp in specs
                          for s in (sp.in_stride, sp.out_stride)})
        caps = default_level_caps(coords.shape[0], strides, shrink=0.8)
        g2 = build_graph(jnp.asarray(coords2), jnp.asarray(mask), specs,
                         caps)
        out2 = model.apply(variables, g2, jnp.asarray(feats), train=False)
        np.testing.assert_allclose(np.asarray(out1)[:n], np.asarray(out2)[:n],
                                   atol=5e-4)

    def test_grad_finite(self, rng):
        coords, mask, feats, n = make_batch(rng, n=80, cap=200)
        model, variables, _, _ = init_and_run(ResUNetBN2C, coords, mask,
                                              feats)
        specs = ResUNetBN2C.conv_specs(3)
        strides = sorted({s for sp in specs
                          for s in (sp.in_stride, sp.out_stride)})
        caps = default_level_caps(coords.shape[0], strides, shrink=0.8)
        g = build_graph(jnp.asarray(coords), jnp.asarray(mask), specs, caps)

        def loss(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                g, jnp.asarray(feats), train=True,
                mutable=["batch_stats"])
            return jnp.sum(out * out)

        grads = jax.grad(loss)(variables["params"])
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert any(np.abs(np.asarray(x)).sum() > 0 for x in flat)


ALL_SPARSE_MODELS = [
    "ResUNetBN2", "ResUNetBN2B", "ResUNetBN2C", "ResUNetBN2D", "ResUNetBN2E",
    "ResUNetFatBN", "ResUNetIN2", "ResUNetIN2C",
    "SimpleNetBN", "SimpleNetBN2", "SimpleNetBN2C", "SimpleNetBN3",
    "SimpleNetIN",
]


class TestRegistry:
    def test_load_model_names(self):
        for name in ALL_SPARSE_MODELS + ["ResUNetFatBNEXP",
                                         "ResUNetFatBNEXP_V2",
                                         "GenerativeMLP", "GenerativeMLP_4",
                                         "ProjectionHeadConv",
                                         "ProjectionHeadMLP"]:
            assert load_model(name) is not None, name
        assert load_model("NoSuchNet") is None

    @pytest.mark.parametrize("name", ALL_SPARSE_MODELS)
    def test_variant_forward(self, rng, name):
        coords, mask, feats, n = make_batch(rng, n=60, cap=160)
        cls = load_model(name)
        _, _, out, _ = init_and_run(cls, coords, mask, feats)
        assert np.isfinite(np.asarray(out)[:n]).all()

    def test_exp_variants_forward(self, rng):
        """Stride-3/k-5 and stride-5-dilated variants run end to end."""
        coords, mask, feats, n = make_batch(rng, n=60, cap=160)
        for name in ("ResUNetFatBNEXP", "ResUNetFatBNEXP_V2"):
            cls = load_model(name)
            _, _, out, _ = init_and_run(cls, coords, mask, feats, ckey=5)
            assert np.isfinite(np.asarray(out)[:n]).all(), name


class TestOccupancyRouting:
    """ones_exact gates the presence-bitmask conv1 path.

    The c1z kernels never read the input features, so they are only a
    valid route when the features are exactly the all-ones occupancy
    input. Under train-time feature jitter (reference
    lib/transforms.py:24-34) SparseConv must fall back to the
    feature-reading path instead of silently dropping the noise.
    """

    def test_jittered_feats_honored(self, rng):
        from gcl_tpu.core import sparse_ops
        from gcl_tpu.core.kernel_maps import ConvSpec
        from gcl_tpu.core.sparse_ops import sparse_conv
        from gcl_tpu.core.types import map_key as mk
        from gcl_tpu.models.common import SparseConv

        xyz = np.unique(rng.randint(-12, 12, size=(300, 3)), axis=0)
        xyz = xyz[np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))]
        n = len(xyz)
        cap = n + 32
        coords = np.full((cap, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        coords[:n, 0] = 0
        coords[:n, 1:] = xyz
        mask = np.zeros(cap, bool)
        mask[:n] = True

        spec = ConvSpec("conv1", 1, 1, 3)
        caps = {1: cap}
        g_ref = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                            [spec], caps, method="bsearch")
        g_fused = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                              [spec], caps, method="fused",
                              sorted_blocks=True, n_clouds=1)
        assert g_fused.fused[spec.key].c1z is not None

        ones = np.asarray(mask, np.float32)[:, None]
        jittered = ones + (rng.randn(cap, 1) * 0.01
                           * mask[:, None]).astype(np.float32)

        module = SparseConv(1, 6, spec, occupancy=True)
        sparse_ops.FORCE_INTERPRET = True
        try:
            variables = module.init(jax.random.PRNGKey(0),
                                    jnp.asarray(ones), g_fused)
            w = variables["params"]["kernel"]
            rk = mk(1, 1, 3, 1)
            out_ones = module.apply(variables, jnp.asarray(ones), g_fused,
                                    True)
            out_jit = module.apply(variables, jnp.asarray(jittered),
                                   g_fused, False)
        finally:
            sparse_ops.FORCE_INTERPRET = False
        oracle_ones = sparse_conv(jnp.asarray(ones), w,
                                  g_ref.kmaps[spec.key], g_ref.kmaps[rk])
        oracle_jit = sparse_conv(jnp.asarray(jittered), w,
                                 g_ref.kmaps[spec.key], g_ref.kmaps[rk])
        np.testing.assert_allclose(np.asarray(out_ones)[:n],
                                   np.asarray(oracle_ones)[:n],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_jit)[:n],
                                   np.asarray(oracle_jit)[:n],
                                   rtol=1e-4, atol=1e-4)
        # the jitter must actually reach the output
        assert np.abs(np.asarray(out_jit)[:n]
                      - np.asarray(out_ones)[:n]).max() > 1e-5

    def test_conv1_jitter_modes(self, rng):
        """conv1_jitter on the c1z route injects output-space noise; on
        feature-reading fallbacks it applies reference-exact input
        jitter. sigma=0 must be exactly the clean output either way."""
        from gcl_tpu.core import sparse_ops
        from gcl_tpu.core.kernel_maps import ConvSpec
        from gcl_tpu.models.common import SparseConv

        xyz = np.unique(rng.randint(-12, 12, size=(300, 3)), axis=0)
        xyz = xyz[np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))]
        n = len(xyz)
        cap = n + 32
        coords = np.full((cap, 4), -1, np.int32)
        coords[:, 0] = int(INVALID_BATCH)
        coords[:n, 0] = 0
        coords[:n, 1:] = xyz
        mask = np.zeros(cap, bool)
        mask[:n] = True
        spec = ConvSpec("conv1", 1, 1, 3)
        g_fused = build_graph(jnp.asarray(coords), jnp.asarray(mask),
                              [spec], {1: cap}, method="fused",
                              sorted_blocks=True, n_clouds=1)
        ones = np.asarray(mask, np.float32)[:, None]
        module = SparseConv(1, 6, spec, occupancy=True)
        rngs = {"jitter": jax.random.PRNGKey(5)}

        import os
        sparse_ops.FORCE_INTERPRET = True
        try:
            variables = module.init(jax.random.PRNGKey(0),
                                    jnp.asarray(ones), g_fused)
            clean = module.apply(variables, jnp.asarray(ones), g_fused)
            j_c1z = module.apply(variables, jnp.asarray(ones), g_fused,
                                 True, (0.1, 1.0, None), rngs=rngs)
            z_c1z = module.apply(variables, jnp.asarray(ones), g_fused,
                                 True, (0.0, 1.0, None), rngs=rngs)
            os.environ["GCL_C1Z"] = "0"   # force the fused fallback
            j_fb = module.apply(variables, jnp.asarray(ones), g_fused,
                                True, (0.1, 1.0, None), rngs=rngs)
            z_fb = module.apply(variables, jnp.asarray(ones), g_fused,
                                True, (0.0, 1.0, None), rngs=rngs)
        finally:
            os.environ.pop("GCL_C1Z", None)
            sparse_ops.FORCE_INTERPRET = False

        for z in (z_c1z, z_fb):
            np.testing.assert_allclose(np.asarray(z)[:n],
                                       np.asarray(clean)[:n],
                                       rtol=1e-5, atol=1e-6)
        for j in (j_c1z, j_fb):
            assert np.abs(np.asarray(j)[:n]
                          - np.asarray(clean)[:n]).max() > 1e-4


class TestRecentredTranslationInvariance:
    def test_features_invariant_under_large_world_translation(self, rng):
        """Per-cloud recentring (core/voxelize._recenter_offsets) makes
        features exactly invariant to large world translations that
        would overflow the absolute conv key window — the capability
        the reference gets from unbounded absolute coords."""
        from gcl_tpu.data.device_pipeline import voxelize_per_cloud
        from gcl_tpu.models.resunet import ResUNetBN2C

        vs = 0.25
        # points centred in their voxels: the large translation pushes
        # coordinates to ~1000 where f32 resolution (~6e-5) could
        # otherwise flip floor() at voxel boundaries
        vox_ids = rng.randint(-24, 24, size=(400, 3))
        pts = ((vox_ids + rng.uniform(0.3, 0.7, (400, 3))) * vs
               ).astype(np.float32)

        def feats_of(cloud):
            vox = voxelize_per_cloud(jnp.asarray(cloud[None]),
                                     jnp.ones((1, 400), bool), vs, 1024)
            model = ResUNetBN2C(1, 16, bn_momentum=0.05,
                                normalize_feature=True,
                                conv1_kernel_size=3, D=3)
            specs = ResUNetBN2C.conv_specs(3)
            strides = sorted({s for sp in specs
                              for s in (sp.in_stride, sp.out_stride)})
            caps = default_level_caps(1024, strides, shrink=0.8)
            flat_c = vox.coords.reshape(-1, 4)
            flat_m = vox.mask.reshape(-1)
            g = build_graph(jnp.asarray(flat_c), jnp.asarray(flat_m),
                            specs, caps)
            variables = model.init(jax.random.PRNGKey(0), g,
                                   jnp.asarray(flat_m[:, None]
                                               .astype(np.float32)))
            out = model.apply(variables, g,
                              jnp.asarray(flat_m[:, None]
                                          .astype(np.float32)),
                              train=False)
            # return features keyed by world position for comparison
            xyz = np.asarray(vox.xyz.reshape(-1, 3))
            return (np.asarray(out)[np.asarray(flat_m)],
                    xyz[np.asarray(flat_m)])

        # shift by an exact multiple of RECENTER_ALIGN voxels so the
        # voxel partition (and thus features) must match exactly
        shift_vox = np.asarray([4000, -4000, 400], np.float32)
        f0, x0 = feats_of(pts)
        f1, x1 = feats_of(pts + shift_vox * vs)
        assert len(f0) == len(f1)
        o0 = np.lexsort(x0.T)
        o1 = np.lexsort((x1 - shift_vox * vs).T)
        np.testing.assert_allclose(f0[o0], f1[o1], atol=2e-3)
