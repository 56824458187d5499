import jax.numpy as jnp
import numpy as np

from vog_tpu.data.boxes import iou_matrix, iou_single, normalize_boxes
from vog_tpu.evaluation import iou_jnp


def test_iou_basic():
    a = np.array([0, 0, 10, 10], np.float32)
    assert iou_single(a, a) == 1.0
    b = np.array([5, 0, 15, 10], np.float32)
    assert abs(iou_single(a, b) - 1 / 3) < 1e-6
    c = np.array([20, 20, 30, 30], np.float32)
    assert iou_single(a, c) == 0.0


def test_iou_matrix_shape(rng):
    a = rng.uniform(0, 50, (7, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2]
    b = rng.uniform(0, 50, (3, 4)).astype(np.float32)
    b[:, 2:] += b[:, :2]
    m = iou_matrix(a, b)
    assert m.shape == (7, 3)
    assert (m >= 0).all() and (m <= 1 + 1e-6).all()


def test_iou_jnp_matches_numpy(rng):
    a = rng.uniform(0, 50, (11, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2]
    b = rng.uniform(0, 50, (11, 4)).astype(np.float32)
    b[:, 2:] += b[:, :2]
    np_diag = np.array([iou_single(a[i], b[i]) for i in range(11)])
    j = np.asarray(iou_jnp(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(j, np_diag, atol=1e-6)


def test_iou_scale_invariance(rng):
    """IoU in normalized coords == IoU in absolute coords."""
    a = rng.uniform(0, 50, (5, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2]
    b = a + rng.uniform(-3, 3, (5, 4)).astype(np.float32)
    sx, sy = 1 / 640.0, 1 / 480.0
    scale = np.array([sx, sy, sx, sy], np.float32)
    m1 = np.diag(iou_matrix(a, b))
    m2 = np.diag(iou_matrix(a * scale, b * scale))
    np.testing.assert_allclose(m1, m2, atol=1e-5)


def test_normalize_boxes():
    b = np.array([[10, 20, 110, 120]], np.float32)
    n = normalize_boxes(b, 200.0, 200.0)
    assert n.shape == (1, 5)
    np.testing.assert_allclose(n[0, :4], [0.05, 0.1, 0.55, 0.6], atol=1e-6)
    np.testing.assert_allclose(n[0, 4], (100 * 100) / (200 * 200), atol=1e-6)
