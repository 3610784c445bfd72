"""Native plate-OCR (eval/ocr_native.py + tools/train_plate_ocr.py).

Reference behavior being replaced: PaddleOCR rec-only on gray plate crops
with [^A-Z0-9] filtering (reference benchmark_plot.py:232-241). These
tests pin the CTC decode semantics, the static-bucket preprocessing, the
benchmark_plot.build_ocr wiring, and (slow) CTC training convergence.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from vcm_ts_tpu.eval.ocr_native import (CHARSET, IMG_H, NUM_CLASSES,
                                        WIDTH_BUCKETS, PlateOCRNative,
                                        ctc_greedy_decode, encode_text,
                                        preprocess_crop)


def _logits_for(ids, t=None):
    """One-hot-ish logits emitting the given class id sequence."""
    t = t or len(ids)
    out = np.full((1, t, NUM_CLASSES), -5.0, np.float32)
    for i in range(t):
        out[0, i, ids[i] if i < len(ids) else 0] = 5.0
    return out


def test_ctc_greedy_decode_collapses_repeats_and_blanks():
    a = CHARSET.index("A") + 1
    b = CHARSET.index("B") + 1
    seven = CHARSET.index("7") + 1
    # A A blank A B 7 7 blank -> "AAB7": repeats collapse unless split
    # by a blank, blanks never emit
    assert ctc_greedy_decode(
        _logits_for([a, a, 0, a, b, seven, seven, 0])) == ["AAB7"]
    assert ctc_greedy_decode(_logits_for([0, 0, 0])) == [""]
    # batch decode keeps row order
    two = np.concatenate([_logits_for([a, 0, b], 4),
                          _logits_for([seven], 4)])
    assert ctc_greedy_decode(two) == ["AB", "7"]


def test_encode_text_round_trip():
    labels, pad = encode_text("AB12", 9)
    assert labels[:4].tolist() == [CHARSET.index(c) + 1 for c in "AB12"]
    assert labels[4:].tolist() == [0] * 5
    assert pad.tolist() == [0.0] * 4 + [1.0] * 5


def test_preprocess_crop_buckets_and_range():
    crop = (np.random.default_rng(0).integers(
        0, 256, (24, 70)).astype(np.uint8))
    out = preprocess_crop(crop)
    assert out.shape[0] == IMG_H and out.shape[2] == 1
    assert out.shape[1] in WIDTH_BUCKETS
    assert out.min() >= -1.0 and out.max() <= 1.0
    # aspect preserved: 70 * 32/24 = 93 -> bucket 96
    assert out.shape[1] == 96
    # a tall skinny crop lands in the smallest bucket
    assert preprocess_crop(np.zeros((64, 40), np.uint8)).shape[1] == 64
    # an extreme panorama clips to the last bucket instead of growing
    assert (preprocess_crop(np.zeros((10, 4000), np.uint8)).shape[1]
            == WIDTH_BUCKETS[-1])


def test_forward_shapes_and_pipeline():
    ocr = PlateOCRNative.init_random(0)
    logits = ocr.model.apply(ocr.params,
                             np.zeros((2, IMG_H, 64, 1), np.float32))
    assert logits.shape == (2, 16, NUM_CLASSES)  # T = W/4
    # end-to-end call contract: [0,1] RGB frame + xyxy boxes -> strings
    frame = np.random.default_rng(1).random((120, 200, 3)).astype(np.float32)
    texts = ocr(frame, [[10, 20, 90, 50], [0, 0, 40, 30]])
    assert len(texts) == 2
    assert all(set(t) <= set(CHARSET) for t in texts)
    # degenerate boxes decode to empty, not crash
    assert ocr(frame, [[5, 5, 5, 5]]) == [""]
    assert ocr(frame, np.zeros((0, 4))) == []


def test_save_load_round_trip(tmp_path):
    ocr = PlateOCRNative.init_random(0)
    path = str(tmp_path / "ocr.npz")
    ocr.save(path)
    ocr2 = PlateOCRNative.load(path)
    x = np.random.default_rng(2).standard_normal(
        (1, IMG_H, 64, 1)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(ocr.model.apply(ocr.params, x)),
                                  np.asarray(ocr2.model.apply(ocr2.params, x)))


def test_build_ocr_picks_native_backend(tmp_path, monkeypatch):
    from conftest import repo_module
    benchmark_plot = repo_module("benchmark_plot")

    path = str(tmp_path / "plate_ocr.npz")
    PlateOCRNative.init_random(0).save(path)
    monkeypatch.setenv("VCM_PLATE_OCR_NPZ", path)
    run = benchmark_plot.build_ocr()
    frame = np.random.default_rng(3).random((64, 128, 3)).astype(np.float32)
    texts = run(frame, np.array([[4.0, 4.0, 60.0, 30.0]]))
    assert len(texts) == 1 and set(texts[0]) <= set(CHARSET)


def test_ctc_loss_decreases_quickly():
    """30 steps on one fixed batch must cut CTC loss — the cheap smoke
    that the loss/step wiring learns at all."""
    import jax
    import optax

    from tools.train_plate_ocr import make_batch

    rng = np.random.default_rng(0)
    ocr = PlateOCRNative.init_random(0)
    images, labels, label_pad, _ = make_batch(8, rng, WIDTH_BUCKETS[-1])
    tx = optax.adamw(1e-3)
    opt_state = tx.init(ocr.params)

    def loss_fn(params):
        logits = ocr.model.apply(params, images)
        pad = np.zeros(logits.shape[:2], np.float32)
        return optax.ctc_loss(logits, pad, labels, label_pad).mean()

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, first = ocr.params, None
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        first = float(loss) if first is None else first
    assert float(loss) < 0.5 * first


_SHIPPED = os.path.join(os.path.dirname(__file__), os.pardir,
                        "pretrained", "plate_ocr.npz")


@pytest.mark.skipif(not os.path.exists(_SHIPPED),
                    reason="no shipped pretrained/plate_ocr.npz "
                           "(train once with tools/train_plate_ocr.py)")
def test_shipped_weights_read_held_out_plates():
    """The committed weights must actually read plates: >= 60% exact-match
    on held-out synthetic renders from an unseen seed (training uses seed
    0; the full-string metric is the reference protocol's strictest text
    metric, benchmark_plot.py:259-297)."""
    from tools.train_plate_ocr import make_batch

    ocr = PlateOCRNative.load(_SHIPPED)
    rng = np.random.default_rng(20260820)
    images, _, _, texts = make_batch(64, rng, WIDTH_BUCKETS[-1])
    pred = ctc_greedy_decode(np.asarray(ocr.model.apply(ocr.params, images)))
    exact = float(np.mean([p == t for p, t in zip(pred, texts)]))
    assert exact >= 0.6, (
        f"exact={exact:.2f}; sample {list(zip(texts[:4], pred[:4]))}")


@pytest.mark.slow
def test_overfit_fixed_plates_decodes_exactly():
    """Train on 8 fixed rendered plates until the greedy decode reproduces
    them — the full CRNN+CTC loop converges, not just the loss."""
    import jax
    import optax

    from tools.train_plate_ocr import make_batch, random_text

    rng = np.random.default_rng(1)
    texts = [random_text(rng) for _ in range(8)]
    images, labels, label_pad, _ = make_batch(
        8, rng, WIDTH_BUCKETS[-1], texts=texts)

    ocr = PlateOCRNative.init_random(1)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(2e-3))
    opt_state = tx.init(ocr.params)

    def loss_fn(params):
        logits = ocr.model.apply(params, images)
        pad = np.zeros(logits.shape[:2], np.float32)
        return optax.ctc_loss(logits, pad, labels, label_pad).mean()

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = ocr.params
    for it in range(400):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.05:
            break
    pred = ctc_greedy_decode(np.asarray(ocr.model.apply(params, images)))
    exact = sum(p == t for p, t in zip(pred, texts))
    assert exact >= 6, f"{exact}/8 exact; {list(zip(texts, pred))}"
