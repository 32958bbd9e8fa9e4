"""Custom CTC loss tests, modeled on reference training/ocr/test_ctc.py:
numerical parity with torch's reference CTC when the real-value channels are
absent, plus behavioral checks of the Gaussian color term."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from manga_image_translator_tpu.training.ctc import custom_ctc_loss


def make_case(rs, n=3, t=12, v=7, s=4):
    logits = rs.randn(n, t, v).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    targets = rs.randint(1, v, (n, s)).astype(np.int64)
    input_lengths = np.array([t, t - 2, t - 4], np.int64)[:n]
    target_lengths = np.array([s, s - 1, s - 2], np.int64)[:n]
    return log_probs, targets, input_lengths, target_lengths


def test_matches_torch_ctc_loss_none_reduction():
    rs = np.random.RandomState(0)
    log_probs, targets, in_len, tg_len = make_case(rs)
    ours = custom_ctc_loss(
        jnp.asarray(log_probs), jnp.asarray(targets), None, None,
        jnp.asarray(in_len), jnp.asarray(tg_len), reduction='none')
    ref = torch.nn.functional.ctc_loss(
        torch.from_numpy(log_probs).permute(1, 0, 2),
        torch.from_numpy(targets), torch.from_numpy(in_len),
        torch.from_numpy(tg_len), blank=0, reduction='none')
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


def test_matches_torch_repeated_labels():
    rs = np.random.RandomState(1)
    n, t, v, s = 2, 16, 5, 6
    logits = rs.randn(n, t, v).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    targets = np.array([[1, 1, 2, 2, 1, 3], [2, 2, 2, 1, 1, 1]], np.int64)
    in_len = np.array([t, t], np.int64)
    tg_len = np.array([6, 6], np.int64)
    ours = custom_ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                           None, None, jnp.asarray(in_len),
                           jnp.asarray(tg_len), reduction='none')
    ref = torch.nn.functional.ctc_loss(
        torch.from_numpy(log_probs).permute(1, 0, 2),
        torch.from_numpy(targets), torch.from_numpy(in_len),
        torch.from_numpy(tg_len), blank=0, reduction='none')
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


def test_gradient_matches_torch():
    """torch's native CTC returns the gradient in the *logits* convention
    (exp(log_probs) - posterior), while JAX autodiff gives the true
    d/d log_probs (= -posterior); they differ by exactly exp(log_probs) at
    active timesteps."""
    rs = np.random.RandomState(2)
    log_probs, targets, in_len, tg_len = make_case(rs, n=2)

    def loss_fn(lp):
        return custom_ctc_loss(lp, jnp.asarray(targets), None, None,
                               jnp.asarray(in_len), jnp.asarray(tg_len),
                               reduction='none').sum()

    ours_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(log_probs)))

    lp_t = torch.from_numpy(log_probs).requires_grad_(True)
    ref = torch.nn.functional.ctc_loss(
        lp_t.permute(1, 0, 2), torch.from_numpy(targets),
        torch.from_numpy(in_len), torch.from_numpy(tg_len), blank=0,
        reduction='sum')
    ref.backward()
    active = np.zeros_like(log_probs)
    for b, l in enumerate(in_len):
        active[b, :l] = 1
    expected = (lp_t.grad.numpy() - np.exp(log_probs)) * active
    np.testing.assert_allclose(ours_grad * active, expected, atol=1e-3)


def test_color_term_prefers_matching_realvals():
    rs = np.random.RandomState(3)
    n, t, v, s, r = 1, 10, 5, 3, 6
    logits = rs.randn(n, t, v).astype(np.float32)
    log_probs = np.asarray(torch.log_softmax(torch.from_numpy(logits), -1))
    targets = np.array([[1, 2, 3]], np.int64)
    tgt_rv = rs.rand(n, s, r).astype(np.float32)
    in_len = np.array([t], np.int64)
    tg_len = np.array([s], np.int64)

    match = np.broadcast_to(tgt_rv.mean(1, keepdims=True),
                            (n, t, r)).astype(np.float32)
    好 = custom_ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                        jnp.asarray(match), jnp.asarray(tgt_rv),
                        jnp.asarray(in_len), jnp.asarray(tg_len),
                        sigma=1.0, blank1=4)
    far = custom_ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                          jnp.asarray(match + 5.0), jnp.asarray(tgt_rv),
                          jnp.asarray(in_len), jnp.asarray(tg_len),
                          sigma=1.0, blank1=4)
    assert float(好) < float(far)


def test_blank1_masks_color_term():
    """Labels equal to blank1 must not pay the Gaussian term."""
    rs = np.random.RandomState(4)
    n, t, v, s, r = 1, 8, 5, 2, 3
    logits = rs.randn(n, t, v).astype(np.float32)
    log_probs = np.asarray(torch.log_softmax(torch.from_numpy(logits), -1))
    blank1 = 4
    targets = np.array([[blank1, blank1]], np.int64)
    in_len = np.array([t], np.int64)
    tg_len = np.array([s], np.int64)
    rv_a = rs.rand(n, t, r).astype(np.float32)
    tgt_rv = rs.rand(n, s, r).astype(np.float32)
    a = custom_ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                        jnp.asarray(rv_a), jnp.asarray(tgt_rv),
                        jnp.asarray(in_len), jnp.asarray(tg_len),
                        blank1=blank1)
    b = custom_ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                        jnp.asarray(rv_a + 100), jnp.asarray(tgt_rv),
                        jnp.asarray(in_len), jnp.asarray(tg_len),
                        blank1=blank1)
    assert float(a) == pytest.approx(float(b))


def test_realval_gradient_flows():
    rs = np.random.RandomState(5)
    n, t, v, s, r = 1, 10, 5, 3, 6
    logits = rs.randn(n, t, v).astype(np.float32)
    log_probs = np.asarray(torch.log_softmax(torch.from_numpy(logits), -1))
    targets = np.array([[1, 2, 3]], np.int64)
    tgt_rv = rs.rand(n, s, r).astype(np.float32)
    rv = rs.rand(n, t, r).astype(np.float32)

    def loss_fn(rv_in):
        return custom_ctc_loss(
            jnp.asarray(log_probs), jnp.asarray(targets), rv_in,
            jnp.asarray(tgt_rv), jnp.asarray([t]), jnp.asarray([s]),
            blank1=4)

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(rv)))
    assert np.abs(g).max() > 0
