"""VQ-IMG loss stack: discriminator, LPIPS, object-LPIPS vjp, face loss,
composite VQGAN loss (SURVEY §2.2 parity; shapes/dtypes + semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mas_tpu.losses.discriminator import (PatchDiscriminator, adopt_weight,
                                          generator_loss, hinge_d_loss)
from mas_tpu.losses.face_loss import (ALPHAS, FaceNet, crop_resize_face,
                                      face_loss, gather_faces)
from mas_tpu.losses.lpips import LPIPS
from mas_tpu.losses.lpips_object import (box_weight_map, lpips_with_object,
                                         scale_gradient)


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


# --- discriminator ----------------------------------------------------------

def test_patch_discriminator_shapes(rng):
    disc = PatchDiscriminator()
    x = jax.random.normal(rng, (2, 64, 64, 3))
    variables = disc.init(rng, x, train=False)
    logits = disc.apply(variables, x, train=False)
    # 3 stride-2 stages (n=0,1,2), n=3 stride 1; 4x4 pad-1 convs shave 1 each
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.shape[1] < 64 // 4

    out, upd = disc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in upd


def test_hinge_losses():
    real = jnp.array([2.0, 2.0])
    fake = jnp.array([-2.0, -2.0])
    # perfectly separated -> zero hinge loss
    assert float(hinge_d_loss(real, fake)) == 0.0
    # symmetric logits at 0 -> relu(1)=1 both sides
    z = jnp.zeros((4,))
    assert float(hinge_d_loss(z, z)) == pytest.approx(1.0)
    assert float(generator_loss(jnp.array([3.0]))) == -3.0


def test_adopt_weight_gating():
    assert float(adopt_weight(1.0, jnp.asarray(10), 20)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(20), 20)) == 1.0
    assert float(adopt_weight(0.5, jnp.asarray(99), 20)) == 0.5


# --- LPIPS ------------------------------------------------------------------

def test_lpips_zero_for_identical(rng):
    lp = LPIPS()
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    variables = lp.init(rng, x, x)
    d = lp.apply(variables, x, x)
    assert d.shape == (2,)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    d2 = lp.apply(variables, x, y)
    assert np.all(np.asarray(d2) > 0)


def test_lpips_torch_conversion_roundtrip():
    """Converted torch layout produces the right flax tree shapes."""
    import numpy as np

    from mas_tpu.losses.lpips import (_TORCH_CONV_IDX, _VGG_PLAN,
                                      convert_torch_lpips_state)
    state = {}
    in_ch = 3
    chans = []
    for ch, n in _VGG_PLAN:
        chans += [ch] * n
    for tidx, out_ch in zip(_TORCH_CONV_IDX, chans):
        state[f"features.{tidx}.weight"] = np.zeros(
            (out_ch, in_ch, 3, 3), np.float32)
        state[f"features.{tidx}.bias"] = np.zeros((out_ch,), np.float32)
        in_ch = out_ch
    for i, c in enumerate((64, 128, 256, 512, 512)):
        state[f"lin{i}.model.1.weight"] = np.ones((1, c, 1, 1), np.float32)
    params = convert_torch_lpips_state(state)
    assert params["vgg"]["conv0_0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["lin4"].shape == (512, 1)

    # converted params drop into the module
    lp = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    ref = lp.init(jax.random.PRNGKey(0), x, x)["params"]
    assert jax.tree_util.tree_structure(ref) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(params)):
        assert a.shape == b.shape


# --- object-aware LPIPS (gradient weighting) --------------------------------

def test_box_weight_map():
    boxes = jnp.array([[[2, 1, 5, 3]], [[0, 0, 0, 0]]], jnp.float32)
    w = box_weight_map(boxes, 4, 8, 3.0)
    assert w.shape == (2, 4, 8, 1)
    w0 = np.asarray(w[0, :, :, 0])
    assert w0[1, 2] == 3.0 and w0[2, 4] == 3.0
    assert w0[0, 2] == 1.0 and w0[1, 5] == 1.0 and w0[3, 2] == 1.0
    # padded zero-area box: all ones
    np.testing.assert_allclose(np.asarray(w[1]), 1.0)


def test_scale_gradient_fwd_identity_bwd_weighted():
    x = jnp.arange(12.0).reshape(1, 3, 4, 1)
    w = jnp.full((1, 3, 4, 1), 2.0)
    assert np.allclose(scale_gradient(x, w), x)
    g = jax.grad(lambda x: jnp.sum(scale_gradient(x, w) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x * w))


def test_lpips_with_object_upweights_box_gradients(rng):
    lp = LPIPS()
    real = jax.random.uniform(rng, (1, 32, 32, 3))
    fake = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    variables = lp.init(rng, real, fake)
    boxes = jnp.array([[[4, 4, 16, 16]]], jnp.float32)

    apply = lambda r, f: lp.apply(variables, r, f)
    g_plain = jax.grad(
        lambda f: jnp.sum(apply(real, f)))(fake)
    g_obj = jax.grad(
        lambda f: jnp.sum(lpips_with_object(apply, real, f, boxes, 5.0)))(fake)
    # forward value identical; gradients inside the box scaled
    v_plain = apply(real, fake)
    v_obj = lpips_with_object(apply, real, fake, boxes, 5.0)
    np.testing.assert_allclose(np.asarray(v_plain), np.asarray(v_obj),
                               rtol=1e-6)
    inside = np.abs(np.asarray(g_obj[0, 8, 8])).sum()
    inside_plain = np.abs(np.asarray(g_plain[0, 8, 8])).sum()
    np.testing.assert_allclose(inside, 5.0 * inside_plain, rtol=1e-4)
    outside = np.asarray(g_obj[0, 30, 30])
    outside_plain = np.asarray(g_plain[0, 30, 30])
    np.testing.assert_allclose(outside, outside_plain, rtol=1e-5)


# --- face loss ---------------------------------------------------------------

def test_crop_resize_face_matches_direct_resize():
    """For a box whose crop is square, crop+Resize(256)+CenterCrop(254)
    == resample of the inner 254/256 fraction; check center-pixel fidelity
    on a smooth ramp image."""
    h = w = 64
    img = (jnp.arange(h * w, dtype=jnp.float32).reshape(h, w, 1)
           / (h * w))
    box = jnp.array([8, 8, 40, 40], jnp.float32)    # 32x32 crop
    out = crop_resize_face(img, box)
    assert out.shape == (254, 254, 1)
    # center of output == center of crop region (24, 24)
    center = float(out[127, 127, 0])
    expected = float(img[24, 24, 0])
    assert abs(center - expected) < 2e-2


def test_gather_faces_validity():
    imgs = jnp.ones((2, 32, 32, 3))
    boxes = jnp.array([[[2, 2, 20, 20], [0, 0, 0, 0]],
                       [[0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32)
    faces, valid = gather_faces(imgs, boxes)
    assert faces.shape == (4, 254, 254, 3)
    np.testing.assert_array_equal(np.asarray(valid),
                                  [True, False, False, False])


@pytest.mark.slow
def test_face_loss_zero_when_identical_and_when_no_faces(rng):
    net = FaceNet()
    x = jax.random.uniform(rng, (2, 254, 254, 3))
    variables = net.init(rng, x, train=False)
    apply = lambda z: net.apply(variables, z, train=False)

    imgs = jax.random.uniform(rng, (1, 64, 64, 3))
    boxes = jnp.array([[[4, 4, 40, 40]]], jnp.float32)
    assert float(face_loss(apply, imgs, imgs, boxes)) == pytest.approx(0.0)

    none = jnp.zeros((1, 1, 4), jnp.float32)
    assert float(face_loss(apply, imgs, imgs * 0.5, none)) == 0.0

    val = float(face_loss(apply, imgs, imgs * 0.5, boxes))
    assert val > 0.0 and np.isfinite(val)


def test_facenet_tap_channels(rng):
    net = FaceNet(layers=(1, 1, 1, 1))   # tiny depth, same channel plan
    x = jnp.zeros((1, 62, 62, 3))
    variables = net.init(rng, x, train=False)
    taps = net.apply(variables, x, train=False)
    assert [t.shape[-1] for t in taps] == [64, 256, 512, 1024, 2048]
    assert len(ALPHAS) == 5


def test_pixelloss_weight_scales_l1():
    """pixelloss_weight is a LIVE knob here (the reference stores it but
    never applies it, loss_img.py:34): the L1 term must scale with it."""
    import jax.numpy as jnp

    from mas_tpu.losses.vqgan import PerceptualFns, nll_loss_fn
    from mas_tpu.utils.config import VQGANLossConfig

    fns = PerceptualFns(lpips=lambda a, b: jnp.zeros(()),
                        disc=lambda x: jnp.zeros(()))
    img = jnp.zeros((2, 8, 8, 3))
    rec = jnp.ones((2, 8, 8, 3)) * 0.5
    boxes = jnp.zeros((2, 1, 4))
    l_1 = nll_loss_fn(fns, VQGANLossConfig(), img, rec, boxes)
    l_2 = nll_loss_fn(fns, VQGANLossConfig(pixelloss_weight=2.0),
                      img, rec, boxes)
    assert float(l_2) == 2 * float(l_1) != 0.0
