import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmvsnet_pl_tpu.models import CascadeMVSNet, CostRegNet, FeatureNet
from casmvsnet_pl_tpu.models.blocks import ConvTransposeBnAct3D

pytestmark = pytest.mark.slow  # full-model tier: minutes of CPU compile


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


# Eager execution on XLA:CPU is dispatch-bound (~2k tiny ops for the full
# cascade, tens of seconds); every full-model call in this tier is jitted
# so it costs one opt-level-0 compile instead.


def test_feature_net_shapes_and_channels():
    m = FeatureNet()
    x = jnp.zeros((2, 64, 64, 3))
    var = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(var, x)
    assert out["level_0"].shape == (2, 64, 64, 8)
    assert out["level_1"].shape == (2, 32, 32, 16)
    assert out["level_2"].shape == (2, 16, 16, 32)


def test_cost_reg_shapes():
    m = CostRegNet()
    x = jnp.zeros((1, 16, 8, 8, 32))
    var = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(var, x)
    assert out.shape == (1, 16, 8, 8)


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    B, D, H, W, Cin, Cout = 1, 4, 6, 6, 8, 4
    x = rng.randn(B, D, H, W, Cin).astype(np.float32)

    m = ConvTransposeBnAct3D(Cout)
    var = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    kernel = np.asarray(var["params"]["kernel"])           # (3,3,3,in,out)

    tconv = torch.nn.ConvTranspose3d(Cin, Cout, 3, stride=2, padding=1,
                                     output_padding=1, bias=False)
    # torch weight (in, out, kd, kh, kw) = our kernel flipped in space
    w = kernel[::-1, ::-1, ::-1].transpose(3, 4, 0, 1, 2).copy()
    tconv.weight.data = torch.from_numpy(w)
    ref = tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    ref = ref.permute(0, 2, 3, 4, 1).detach().numpy()

    # compare the raw transposed conv (pre-BN): BN at init is identity-ish
    # (scale 1, bias 0, running stats 0/1) followed by leaky_relu; invert it.
    with jax.default_matmul_precision("float32"):
        out = m.apply(var, jnp.asarray(x))
    out = np.asarray(out)
    slope = 0.01
    undo = np.where(out >= 0, out, out / slope)
    assert ref.shape == undo.shape == (B, 2 * D, 2 * H, 2 * W, Cout)
    # eps=1e-5 in BN denominator -> scale factor 1/sqrt(1+1e-5)
    assert np.allclose(undo, ref / np.sqrt(1 + 1e-5), atol=2e-4)


@pytest.fixture(scope="module")
def tiny_cascade():
    B, V, H, W = 1, 3, 32, 32
    model = CascadeMVSNet(n_depths=(8, 8, 16), interval_ratios=(1., 2., 4.))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    # identity-ish projections with small translations, per level scaling
    proj = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
                   (B, V - 1, 3, 1, 1))
    proj[..., 0, 3] = rng.randn(B, V - 1, 3) * 5
    proj_mats = jnp.asarray(proj)
    var = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, proj_mats,
                              425.0, 2.65)
    japply = jax.jit(model.apply)
    return model, var, imgs, proj_mats, japply


def test_cascade_output_shapes(tiny_cascade):
    model, var, imgs, proj_mats, japply = tiny_cascade
    out = japply(var, imgs, proj_mats, 425.0, 2.65)
    assert out["depth_0"].shape == (1, 32, 32)
    assert out["depth_1"].shape == (1, 16, 16)
    assert out["depth_2"].shape == (1, 8, 8)
    for l in range(3):
        c = out[f"confidence_{l}"]
        assert c.shape == out[f"depth_{l}"].shape
        assert np.all(np.asarray(c) >= 0) and np.all(np.asarray(c) <= 1 + 1e-5)
        # depths must lie within the overall swept range
        d = np.asarray(out[f"depth_{l}"])
        assert np.all(d > 0)


def test_cascade_scalar_vs_batched_depth_args(tiny_cascade):
    model, var, imgs, proj_mats, japply = tiny_cascade
    out_s = japply(var, imgs, proj_mats, 425.0, 2.65)
    out_b = japply(var, imgs, proj_mats, jnp.asarray([425.0]),
                   jnp.asarray([2.65]))
    for k in out_s:
        assert np.allclose(np.asarray(out_s[k]), np.asarray(out_b[k]),
                           atol=1e-5)


def test_chunked_apply_matches_batched(tiny_cascade):
    """chunked_apply (batched features + lax.map'd cascade) is exact.

    The chunked path exists for VMEM locality at batch >= 4 on TPU
    (PERF_NOTES.md "Batch scaling"); numerically it must match the plain
    batched forward bit-for-bit up to reduction order.
    """
    from casmvsnet_pl_tpu.models import chunked_apply
    model, var, imgs, proj_mats, japply = tiny_cascade
    rng = np.random.RandomState(1)
    imgs2 = jnp.concatenate(
        [imgs, imgs + jnp.asarray(0.1 * rng.randn(*imgs.shape)
                                  .astype(np.float32))], axis=0)
    proj2 = jnp.concatenate([proj_mats, proj_mats], axis=0)
    full = japply(var, imgs2, proj2, 425.0, 2.65)
    chunked = jax.jit(
        lambda v, im, pr: chunked_apply(model, v, im, pr, 425.0, 2.65,
                                        chunk=1))(var, imgs2, proj2)
    for k in full:
        assert np.allclose(np.asarray(full[k]), np.asarray(chunked[k]),
                           atol=1e-5), k


def test_cascade_groupwise(tiny_cascade):
    _, _, imgs, proj_mats, _ = tiny_cascade
    model = CascadeMVSNet(n_depths=(8, 8, 16), interval_ratios=(1., 2., 4.),
                          num_groups=4)
    var = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, proj_mats,
                              425.0, 2.65)
    out = jax.jit(model.apply)(var, imgs, proj_mats, 425.0, 2.65)
    assert out["depth_0"].shape == (1, 32, 32)
    # groupwise cost-reg input channels = G
    k = var["params"]["cost_reg_0"]["conv0"]["conv"]["kernel"]
    assert k.shape[-2] == 4


def test_param_count_close_to_reference():
    # hand-computed from the reference architecture
    # (/root/reference/models/mvsnet.py): FeatureNet ~46k + CostRegNets with
    # in_channels 8/16/32 ~888k => ~934k trainable parameters total
    model = CascadeMVSNet()
    imgs = jnp.zeros((1, 2, 32, 32, 3))
    proj = jnp.zeros((1, 1, 3, 3, 4))
    var = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, proj, 425.0, 2.65)
    n = _param_count(var["params"])
    assert 9.0e5 < n < 9.7e5, f"param count {n}"


def test_gradients_flow_and_are_finite(tiny_cascade):
    model, var, imgs, proj_mats, _ = tiny_cascade

    def loss_fn(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": var["batch_stats"]},
                             imgs, proj_mats, 425.0, 2.65, train=True,
                             mutable=["batch_stats"])
        return sum(jnp.mean(out[f"depth_{l}"]) for l in range(3))

    grads = jax.jit(jax.grad(loss_fn))(var["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # feature net must receive gradient through the warp
    g_feat = jax.tree.leaves(grads["feature"])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in g_feat)


def test_confidence_sum4_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from casmvsnet_pl_tpu.models.cascade import _sum4_confidence

    rng = np.random.RandomState(3)
    B, D, H, W = 2, 8, 4, 4
    logits = rng.randn(B, D, H, W).astype(np.float32)
    prob = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))

    conf = np.asarray(_sum4_confidence(jnp.asarray(prob), D))

    tp = torch.from_numpy(prob)
    sum4 = 4 * F.avg_pool3d(F.pad(tp.unsqueeze(1), pad=(0, 0, 0, 0, 1, 2)),
                            (4, 1, 1), stride=1).squeeze(1)
    idx = (tp * torch.arange(D, dtype=torch.float32)[None, :, None, None]) \
        .sum(1).long().clamp(0, D - 1)
    ref = torch.gather(sum4, 1, idx.unsqueeze(1)).squeeze(1).numpy()
    assert np.allclose(conf, ref, atol=1e-5)
