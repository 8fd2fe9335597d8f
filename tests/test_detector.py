"""Detector: shapes, decode correctness on a hand-built heatmap, loss, and a
tiny overfit run proving gradients flow end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from reid_tpu.models.detector import (
    CenterNetLite, decode_detections, detection_loss,
)


def test_detector_forward_and_decode_shapes():
    m = CenterNetLite(base=8)
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out["heat"].shape == (2, 16, 16, 1)
    tlwh, scores = decode_detections(out, max_dets=8)
    assert tlwh.shape == (2, 8, 4) and scores.shape == (2, 8)


def test_decode_finds_planted_peaks():
    h = w = 16
    heat = np.full((1, h, w, 1), -8.0, np.float32)  # sigmoid ~ 0
    heat[0, 4, 5, 0] = 8.0
    heat[0, 10, 12, 0] = 6.0
    wh = np.zeros((1, h, w, 2), np.float32)
    wh[0, 4, 5] = (5.0, 10.0)    # at stride 4: 20 x 40 box
    wh[0, 10, 12] = (2.0, 4.0)
    off = np.zeros((1, h, w, 2), np.float32)
    tlwh, scores = decode_detections(
        {"heat": jnp.asarray(heat), "wh": jnp.asarray(wh),
         "offset": jnp.asarray(off)}, max_dets=4)
    tlwh = np.asarray(tlwh)[0]
    scores = np.asarray(scores)[0]
    assert scores[0] > scores[1] > 0.9
    # first box centered at (x=5, y=4) * 4 with size (20, 40)
    np.testing.assert_allclose(tlwh[0], [20 - 10, 16 - 20, 20, 40], atol=1e-4)
    assert scores[2] < 0.01  # rest is background


def test_detector_overfits_one_target():
    m = CenterNetLite(base=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    gt_heat = np.zeros((1, 16, 16), np.float32)
    gt_heat[0, 8, 8] = 1.0
    gt_wh = np.zeros((1, 16, 16, 2), np.float32)
    gt_wh[0, 8, 8] = (4.0, 8.0)
    gt_off = np.zeros((1, 16, 16, 2), np.float32)
    gt_mask = gt_heat > 0.5
    args = tuple(jnp.asarray(a) for a in (gt_heat, gt_wh, gt_off, gt_mask))

    tx = optax.adam(1e-3)
    opt = tx.init(v["params"])

    @jax.jit
    def step(params, bs, opt):
        def loss_fn(p):
            out, mut = m.apply({"params": p, "batch_stats": bs}, x,
                               train=True, mutable=["batch_stats"])
            return detection_loss(out, *args), mut["batch_stats"]
        (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), new_bs, opt, l

    params, bs = v["params"], v["batch_stats"]
    first = None
    for i in range(60):
        params, bs, opt, l = step(params, bs, opt)
        if first is None:
            first = float(l)
    assert float(l) < first * 0.5  # converging
    out, _ = m.apply({"params": params, "batch_stats": bs}, x, train=True,
                     mutable=["batch_stats"])
    tlwh, scores = decode_detections(out, max_dets=2)
    # strongest peak lands on the target cell
    cx = float(tlwh[0, 0, 0] + tlwh[0, 0, 2] / 2)
    cy = float(tlwh[0, 0, 1] + tlwh[0, 0, 3] / 2)
    assert abs(cx - 32) < 8 and abs(cy - 32) < 8


def test_make_centernet_targets():
    from reid_tpu.models.detector import make_centernet_targets

    tlwh = jnp.asarray([[[28.0, 24, 8, 16], [0, 0, 0, 0]]])   # one valid box
    valid = jnp.asarray([[True, False]])
    heat, wh, off, mask = make_centernet_targets(tlwh, valid, (64, 64))
    assert heat.shape == (1, 16, 16)
    # peak at the box center cell: cx=32/4=8, cy=32/4=8
    assert float(heat[0, 8, 8]) == 1.0
    assert bool(mask[0, 8, 8])
    np.testing.assert_allclose(np.asarray(wh[0, 8, 8]), [2.0, 4.0])
    assert int(np.asarray(mask).sum()) == 1  # invalid box wrote nothing

    # targets + loss + decode close the loop
    from reid_tpu.models.detector import decode_detections
    big = np.asarray(heat)
    assert big.max() == 1.0


def test_train_detector_driver(rng):
    """train_detector loss decreases and make_detector_fn keeps the
    serve-path contract (tlwh/conf/valid in frame pixels)."""
    from reid_tpu.train.detector_train import (make_detector_fn,
                                               train_detector)

    n, h, w = 8, 96, 128
    frames = rng.integers(0, 40, (n, h, w, 3)).astype(np.uint8)
    boxes = np.zeros((n, 4, 4), np.float32)
    valid = np.zeros((n, 4), bool)
    for i in range(n):
        x, y = 20 + 6 * i, 30
        frames[i, y:y + 40, x:x + 16] = 230
        boxes[i, 0] = (x, y, 16, 40)
        valid[i, 0] = True
    model, variables, losses = train_detector(
        frames, boxes, valid, det_hw=(96, 128), epochs=3, batch_size=4,
        base=8, log_fn=lambda *_: None)
    assert losses[-1] < losses[0]
    detect = make_detector_fn(model, variables, (96, 128), max_dets=8,
                              min_conf=0.0)
    tlwh, conf, vmask = detect(frames[0])
    assert tlwh.shape == (8, 4) and conf.shape == (8,)
    assert vmask.dtype == bool
