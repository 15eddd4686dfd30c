import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.ops import losses as L


def _rand(shape, seed=0):
    r = np.random.RandomState(seed)
    return jnp.asarray(r.randn(*shape).astype(np.float32))


def _randmask(shape, seed=1):
    r = np.random.RandomState(seed)
    return jnp.asarray((r.rand(*shape) > 0.5).astype(np.float32))


class TestClosedForm:
    def test_bce_matches_formula(self):
        y = _randmask((2, 8, 8, 1))
        x = _rand((2, 8, 8, 1))
        got = L.binary_crossentropy(y, x)
        p = jax.nn.sigmoid(x)
        want = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p)).mean()
        assert np.allclose(got, want, atol=1e-5)

    def test_bce_perfect_prediction_near_zero(self):
        y = _randmask((1, 4, 4, 1))
        logits = (y * 2 - 1) * 20.0
        assert float(L.binary_crossentropy(y, logits)) < 1e-6

    def test_dice_perfect_is_zero(self):
        y = _randmask((2, 16, 16, 1))
        logits = (y * 2 - 1) * 30.0
        assert float(L.dice_loss(y, logits)) < 1e-3

    def test_dice_worst_near_one(self):
        y = jnp.ones((1, 16, 16, 1))
        logits = jnp.full((1, 16, 16, 1), -30.0)
        assert float(L.dice_loss(y, logits)) > 0.95

    def test_jaccard_half_overlap(self):
        # pred = all ones (hard), truth = half ones -> iou = (128+1)/(256+1)
        y = jnp.zeros((1, 16, 16, 1)).at[:, :8].set(1.0)
        logits = jnp.full((1, 16, 16, 1), 30.0)
        got = float(L.jaccard_loss(y, logits))
        want = 1.0 - (128 + 1.0) / (256 + 1.0)
        assert np.isclose(got, want, atol=1e-3)

    def test_categorical_ce(self):
        r = np.random.RandomState(3)
        y_idx = r.randint(0, 3, size=(2, 4, 4))
        y = jax.nn.one_hot(jnp.asarray(y_idx), 3)
        x = _rand((2, 4, 4, 3))
        got = L.categorical_crossentropy(y, x)
        want = -(y * jax.nn.log_softmax(x, -1)).sum(-1).mean()
        assert np.allclose(got, want, atol=1e-5)

    def test_focal_reduces_to_weighted_ce_at_gamma0(self):
        y = _randmask((2, 8, 8, 1))
        x = _rand((2, 8, 8, 1))
        got = L.binary_focal_loss(y, x, gamma=0.0, alpha=0.5)
        want = 0.5 * L.binary_crossentropy(y, x)
        assert np.allclose(got, want, atol=1e-5)

    def test_lovasz_hinge_perfect(self):
        y = _randmask((1, 8, 8, 1))
        logits = (y * 2 - 1) * 10.0
        assert float(L.lovasz_hinge(y, logits)) < 1e-3

    def test_lovasz_softmax_runs_and_improves(self):
        r = np.random.RandomState(5)
        y = jax.nn.one_hot(jnp.asarray(r.randint(0, 3, (1, 8, 8))), 3)
        bad = _rand((1, 8, 8, 3), seed=6)
        good = (y * 2 - 1) * 10.0
        assert float(L.lovasz_softmax(y, good)) < float(L.lovasz_softmax(y, bad))


class TestGradients:
    @pytest.mark.parametrize("name", [
        "binary_crossentropy", "dice_loss", "jaccard_loss",
        "binary_focal_loss", "lovasz_hinge", "tversky_loss",
    ])
    def test_finite_grads(self, name):
        fn = dict(L.registry_entries() and {n: f for n, f, _ in L.registry_entries()})[name]
        y = _randmask((2, 8, 8, 1))
        x = _rand((2, 8, 8, 1))
        g = jax.grad(lambda lg: fn(y, lg, "sigmoid"))(x)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestCompositeParser:
    def test_single(self):
        terms = L.parse_loss_expr("dice_loss")
        assert len(terms) == 1 and terms[0][0] == 1.0

    def test_weighted_sum(self):
        terms = L.parse_loss_expr("binary_crossentropy + 0.25*dice_loss")
        assert [(w, n) for w, n, _ in terms] == [
            (1.0, "binary_crossentropy"), (0.25, "dice_loss")]

    def test_minus(self):
        terms = L.parse_loss_expr("bce - 0.5 * jaccard")
        assert terms[1][0] == -0.5

    def test_aliases(self):
        assert L.parse_loss_expr("bce")[0][2] is L.binary_crossentropy

    def test_unknown_name(self):
        with pytest.raises(L.LossExprError, match="Did you mean"):
            L.parse_loss_expr("dice_los")

    def test_garbage(self):
        with pytest.raises(L.LossExprError):
            L.parse_loss_expr("1.5 ** dice")

    def test_build_loss_value(self):
        y = _randmask((2, 8, 8, 1))
        x = _rand((2, 8, 8, 1))
        f = L.build_loss("binary_crossentropy + 0.25*dice_loss", "sigmoid")
        want = L.binary_crossentropy(y, x) + 0.25 * L.dice_loss(y, x)
        assert np.allclose(f(y, x), want, atol=1e-6)
