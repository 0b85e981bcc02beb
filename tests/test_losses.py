"""Loss parity vs reference torch goldens + distributed equivalence.

Goldens from `tests/gen_golden_losses.py` (reference loss.py / loss copy.py).
Distributed tests run on the virtual 8-device CPU mesh and assert that the
shard_map losses equal their single-device global-batch forms — the invariant
the reference's `local_loss`+gather construction is supposed to preserve
(SURVEY.md §4).
"""

import os
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mrclip_tpu.losses import (
    arange_cross_entropy,
    clip_loss,
    mahalanobis_distance,
    multi_positive_cross_entropy_loss,
    multi_positive_cross_entropy_loss_with_distance,
    multipositive_clip_loss,
    multipositive_clip_loss_vision_only,
    multipositive_clip_loss_with_distance,
    pos_mask_from_labels,
    siglip_loss,
    supervised_contrastive_loss,
    weighted_euclidean_distance,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_losses.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


def test_multi_positive_ce_parity(g):
    got = multi_positive_cross_entropy_loss(jnp.asarray(g["logits"]), jnp.asarray(g["pos_mask"]))
    np.testing.assert_allclose(np.asarray(got), g["mp_ce"], rtol=1e-6)


def test_distance_parity(g):
    we = weighted_euclidean_distance(
        jnp.asarray(g["te"]), jnp.asarray(g["tr"]), jnp.asarray(g["all_te"]), jnp.asarray(g["all_tr"])
    )
    np.testing.assert_allclose(np.asarray(we), g["weighted_euclidean"], rtol=1e-5)
    mh = mahalanobis_distance(
        jnp.asarray(g["te"]), jnp.asarray(g["tr"]), jnp.asarray(g["all_te"]), jnp.asarray(g["all_tr"])
    )
    np.testing.assert_allclose(np.asarray(mh), g["mahalanobis"], rtol=1e-4, atol=1e-5)


def test_multi_positive_ce_with_distance_parity(g):
    got = multi_positive_cross_entropy_loss_with_distance(
        jnp.asarray(g["logits"]), jnp.asarray(g["pos_mask"]), jnp.asarray(g["weighted_euclidean"])
    )
    np.testing.assert_allclose(np.asarray(got), g["mp_ce_dist"], rtol=1e-6)


def test_clip_loss_parity(g):
    got = clip_loss(jnp.asarray(g["img"]), jnp.asarray(g["txt"]), jnp.asarray(g["scale"]))["loss"]
    np.testing.assert_allclose(np.asarray(got), g["clip_loss"], rtol=1e-5)


def test_siglip_loss_parity(g):
    got = siglip_loss(
        jnp.asarray(g["img"]), jnp.asarray(g["txt"]), jnp.asarray(g["scale"]), jnp.asarray(g["bias"])
    )["loss"]
    np.testing.assert_allclose(np.asarray(got), g["siglip_loss"], rtol=1e-5)


def test_multipositive_clip_loss_parity(g):
    got = multipositive_clip_loss(
        jnp.asarray(g["img"]), jnp.asarray(g["txt"]), jnp.asarray(g["labels_row"]),
        jnp.asarray(g["scale"]), delta=0.3,
    )["loss"]
    np.testing.assert_allclose(np.asarray(got), g["mp_clip_loss"], rtol=1e-5)


def test_supcon_spec_parity(g):
    got = supervised_contrastive_loss(jnp.asarray(g["sup_feats"]), jnp.asarray(g["sup_labels"]))
    np.testing.assert_allclose(np.asarray(got), g["supcon"], rtol=1e-5)


# ---------------------------------------------------------------------------
# Distributed equivalence on the 8-device CPU mesh
# ---------------------------------------------------------------------------

def _mesh():
    return Mesh(np.array(jax.devices()[:8]), axis_names=("data",))


def _rand_features(key, n, d):
    x = jax.random.normal(key, (n, d))
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def dist_inputs():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    n, d = 64, 32  # 8 per device
    img = _rand_features(k1, n, d)
    txt = _rand_features(k2, n, d)
    labels = jax.random.randint(k3, (n,), 0, 10)
    te = jax.random.uniform(k1, (n,), minval=0.01, maxval=0.2)
    tr = jax.random.uniform(k2, (n,), minval=0.5, maxval=9.0)
    return img, txt, labels, te, tr


@pytest.mark.parametrize("gather_with_grad", [True, False])
def test_sharded_multipositive_equals_global(dist_inputs, gather_with_grad):
    img, txt, labels, _, _ = dist_inputs
    scale = jnp.float32(20.0)
    mesh = _mesh()

    expected = multipositive_clip_loss(img, txt, labels, scale, delta=0.4)["loss"]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P(),
    )
    def sharded(img, txt, labels):
        out = multipositive_clip_loss(
            img, txt, labels, scale, delta=0.4, axis_name="data",
            gather_with_grad=gather_with_grad,
        )["loss"]
        return jax.lax.pmean(out, "data")

    got = jax.jit(sharded)(img, txt, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5)


def test_sharded_gather_gradients_match_global(dist_inputs):
    """Differentiable gather: sharded grads == global-batch grads."""
    img, txt, labels, _, _ = dist_inputs
    scale = jnp.float32(20.0)
    mesh = _mesh()

    def global_loss(img, txt):
        return multipositive_clip_loss(img, txt, labels, scale)["loss"]

    g_img_expected = jax.grad(global_loss)(img, txt)

    @partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data"), P("data")), out_specs=P())
    def sharded_loss(img, txt, labels):
        out = multipositive_clip_loss(
            img, txt, labels, scale, axis_name="data", gather_with_grad=True
        )["loss"]
        return jax.lax.pmean(out, "data")

    g_img = jax.jit(jax.grad(lambda i, t: sharded_loss(i, t, labels)))(img, txt)
    np.testing.assert_allclose(np.asarray(g_img), np.asarray(g_img_expected), atol=1e-6)


def test_sharded_clip_loss_equals_global(dist_inputs):
    img, txt, _, _, _ = dist_inputs
    scale = jnp.float32(20.0)
    mesh = _mesh()
    expected = clip_loss(img, txt, scale)["loss"]

    @partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    def sharded(img, txt):
        return jax.lax.pmean(clip_loss(img, txt, scale, axis_name="data")["loss"], "data")

    got = jax.jit(sharded)(img, txt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5)


@pytest.mark.parametrize("impl", ["bidir", "shift", "gather"])
def test_sharded_siglip_equals_global(dist_inputs, impl):
    img, txt, _, _, _ = dist_inputs
    scale, bias = jnp.float32(15.0), jnp.float32(-8.0)
    mesh = _mesh()
    # Global loss = (sum over all W*B x W*B pairs) / (W*B); per-device losses
    # normalize their B x W*B pair-sums by B, so the pmean over devices equals
    # the global form exactly.
    expected = siglip_loss(img, txt, scale, bias)["loss"]

    @partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    def sharded(img, txt):
        out = siglip_loss(img, txt, scale, bias, axis_name="data", impl=impl)["loss"]
        return jax.lax.pmean(out, "data")

    got = jax.jit(sharded)(img, txt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5)


def test_sharded_distance_loss_equals_global(dist_inputs):
    img, txt, labels, te, tr = dist_inputs
    scale = jnp.float32(20.0)
    mesh = _mesh()
    expected = multipositive_clip_loss_with_distance(img, txt, labels, te, tr, scale)["loss"]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"),) * 5, out_specs=P(),
    )
    def sharded(img, txt, labels, te, tr):
        out = multipositive_clip_loss_with_distance(
            img, txt, labels, te, tr, scale, axis_name="data"
        )["loss"]
        return jax.lax.pmean(out, "data")

    got = jax.jit(sharded)(img, txt, labels, te, tr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5)


def test_sharded_vision_only_equals_global(dist_inputs):
    img, _, labels, _, _ = dist_inputs
    scale = jnp.float32(20.0)
    mesh = _mesh()
    expected = multipositive_clip_loss_vision_only(img, labels, scale)["loss"]

    @partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
    def sharded(img, labels):
        out = multipositive_clip_loss_vision_only(img, labels, scale, axis_name="data")["loss"]
        return jax.lax.pmean(out, "data")

    got = jax.jit(sharded)(img, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5)
