"""Model zoo shape/dtype/protocol tests (SURVEY §4 test pyramid).

All run on the CPU backend with f32 compute (bf16 emulation on CPU is slow)
and tiny spatial sizes; divisibility constraints mirror the real patch
sizes (everything divides by 32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.models import build_model, MODEL_REGISTRY
from cvcs_tpu.models.ensemble import Ensemble, EnsembleMember

F32 = dict(dtype=jnp.float32)
P = 32  # tiny stand-in for 224; divisible by 32 for all backbones
NUM_CLASSES = 16


def _init_and_apply(model, x, train=False):
    # jit the whole init: eager linen init compiles one tiny XLA program per
    # parameter, which is pathologically slow on this CPU.
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    out = jax.jit(model.apply, static_argnames=("train", "mutable"))(
        variables, x, train=train,
        rngs={"dropout": jax.random.key(2)},
        mutable=("batch_stats",) if train else False)
    return variables, out


@pytest.mark.parametrize("name", ["Unet", "Unetv2"])
def test_unet_family_shapes(name):
    model, spec = build_model(name, NUM_CLASSES, **F32)
    x = jnp.zeros((2, P, P, 3), jnp.float32)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (2, P, P, NUM_CLASSES)
    assert logits.dtype == jnp.float32
    assert spec.returns_logits and not spec.requires_context


@pytest.mark.parametrize("name,backbone_kw", [
    ("Resnet50", {}),
    ("MobileNet", {}),
])
def test_deeplab_shapes(name, backbone_kw):
    model, spec = build_model(name, NUM_CLASSES, **F32, **backbone_kw)
    x = jnp.zeros((1, P, P, 3), jnp.float32)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (1, P, P, NUM_CLASSES)
    assert spec.wrapper


def test_deeplab_resnet18_swap():
    model, _ = build_model("MobileNetResnet18", NUM_CLASSES, **F32)
    x = jnp.zeros((1, P, P, 3), jnp.float32)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (1, P, P, NUM_CLASSES)


def test_deeplab_googlenet_swap():
    model, _ = build_model("MobileNetGoogle", NUM_CLASSES, **F32)
    x = jnp.zeros((1, P, P, 3), jnp.float32)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (1, P, P, NUM_CLASSES)


def test_segformer_b0_shapes():
    model, _ = build_model("SegformerB0", NUM_CLASSES, **F32)
    x = jnp.zeros((1, P, P, 3), jnp.float32)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (1, P, P, NUM_CLASSES)


def test_train_mode_updates_batch_stats():
    model, _ = build_model("Unetv2", NUM_CLASSES, **F32)
    x = jax.random.uniform(jax.random.key(3), (2, P, P, 3)) * 255.0
    variables, (logits, mutated) = _init_and_apply(model, x, train=True)
    # running stats must move away from init
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_ensemble_majority_vote():
    b, h, w = 1, 4, 4

    def const_member(label):
        def apply(image, context=None):
            return jnp.full((b, h, w), label, jnp.int32)
        return EnsembleMember(f"m{label}", apply, returns_logits=False)

    ens = Ensemble(
        [const_member(3), const_member(3), const_member(5)], NUM_CLASSES)
    out = ens(jnp.zeros((b, h, w, 3)))
    assert out.shape == (b, h, w)
    assert int(out[0, 0, 0]) == 3

    # tie -> smallest label (torch.mode parity)
    ens2 = Ensemble([const_member(7), const_member(2)], NUM_CLASSES)
    assert int(ens2(jnp.zeros((b, h, w, 3)))[0, 0, 0]) == 2


def test_ensemble_vote_traced_variables():
    """The CLI path: member weights ride as traced jit arguments (never
    closures — closed-over params bake into the HLO as constants)."""
    b, h, w = 1, 4, 4

    def member(bias):
        def apply(variables, image, context=None):
            # toy "model": label = round(bias) everywhere
            return jnp.full((b, h, w), variables["bias"], jnp.int32)
        return EnsembleMember(f"b{bias}", apply, returns_logits=False,
                              variables={"bias": jnp.int32(bias)})

    ens = Ensemble([member(2), member(7), member(7)], NUM_CLASSES)
    vote = jax.jit(lambda mv, img: ens.vote(mv, img))
    out = vote(ens.member_variables, jnp.zeros((b, h, w, 3)))
    assert int(out[0, 0, 0]) == 7
    # convenience __call__ matches
    assert int(ens(jnp.zeros((b, h, w, 3)))[0, 0, 0]) == 7


def test_registry_rejects_unknown():
    with pytest.raises(ValueError):
        build_model("TSwin", NUM_CLASSES)  # docs-drift net, must not exist
    with pytest.raises(ValueError):
        build_model("Ensemble", NUM_CLASSES)


def test_registry_names_cover_reference_zoo():
    for name in ["Unet", "Unetv2", "Resnet101", "Resnet50", "MobileNet",
                 "SegformerMod"]:
        assert name in MODEL_REGISTRY


def test_mxu_convtranspose_equals_flax():
    """blocks.ConvTranspose (matmul + depth-to-space) must be bit-parity
    with nn.ConvTranspose(k=2, s=2) under identical params."""
    import numpy as np
    from flax import linen as nn

    from cvcs_tpu.models import blocks

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 6)).astype(np.float32))
    ours = blocks.ConvTranspose(4, dtype=jnp.float32)
    ref = nn.ConvTranspose(4, kernel_size=(2, 2), strides=(2, 2),
                           dtype=jnp.float32, param_dtype=jnp.float32)
    v = ours.init(jax.random.key(1), x)
    got = ours.apply(v, x)
    want = ref.apply(v, x)   # identical param tree (kernel + bias)
    assert got.shape == want.shape == (2, 16, 20, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_unetv2_s2d_variant_shapes():
    """Opt-in space-to-depth stem: full-resolution logits, halved internal
    resolution (perf variant — not weight-compatible with the reference)."""
    from cvcs_tpu.models import build_model

    model, spec = build_model("Unetv2S2D", 16, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 16)
    assert spec.returns_logits


def test_unetv2_s2d_variant_trains():
    """The perf variant must LEARN, not just compile: overfit a fixed
    labels-in-image batch and drive the loss toward zero."""
    from cvcs_tpu.models import build_model
    from cvcs_tpu.ops.losses import build_loss
    from cvcs_tpu.train import build_optimizer, create_train_state
    from cvcs_tpu.train.step import make_train_step

    model, spec = build_model("Unetv2S2D", 16, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mask = np.kron(rng.integers(0, 16, (2, 4, 4)),
                   np.ones((8, 8), np.int64)).astype(np.int32)
    image = np.repeat(
        (mask * 16).astype(np.uint8)[..., None], 3, axis=-1)  # labels visible
    state = create_train_state(
        model, build_optimizer("SGD2"), jnp.asarray(image))
    step = make_train_step(build_loss("CEL"))
    losses = []
    for _ in range(8):
        state, loss = step(state, jnp.asarray(image), jnp.asarray(mask),
                           jnp.zeros((), jnp.uint8), jnp.float32(0.05),
                           jax.random.key(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses


def test_unet_block_remat_is_exact():
    """UNet(remat=True) (block-level nn.remat with pinned scope names)
    must be a pure memory trade: identical init (names match the plain
    auto-names, so checkpoints/importers are remat-agnostic), identical
    loss, gradients, and BN stat updates."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), np.uint8)
                    ).astype(jnp.float32)
    m_p, _ = build_model("Unetv2", 16, dtype=jnp.float32)
    m_r, _ = build_model("Unetv2", 16, dtype=jnp.float32, remat=True)
    v_p = m_p.init(jax.random.key(0), x, train=False)
    v_r = m_r.init(jax.random.key(0), x, train=False)
    pp = jax.tree_util.tree_leaves(v_p["params"])
    pr = jax.tree_util.tree_leaves(v_r["params"])
    assert len(pp) == len(pr)
    assert all(np.array_equal(a, b) for a, b in zip(pp, pr))

    def run(m, v):
        def f(p):
            out, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32) ** 2), mut
        (l, mut), g = jax.value_and_grad(f, has_aux=True)(v["params"])
        return l, g, mut["batch_stats"]

    lp, gp, sp = run(m_p, v_p)
    lr, gr, sr = run(m_r, v_r)
    assert float(lp) == float(lr)
    for a, b in zip(jax.tree_util.tree_leaves((gp, sp)),
                    jax.tree_util.tree_leaves((gr, sr))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
