"""Keras multi_unet_model → JAX seg-UNet weight-import parity.

Builds the reference's evaluator topology (``evaluateCNSiegfried.py:31-36`` loads a
standard 16→256 4-level U-Net; its ``Unet.py`` is an absent vendored file) as a genuine
keras model, imports its weights via ``utils/keras_ckpt.py``, and checks class probabilities
match — so the external ``segmentationModelSiegfried.weights.h5`` can drive our MIoU vote.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

os.environ.setdefault("KERAS_BACKEND", "torch")
keras = pytest.importorskip("keras")

from topomap_tpu.models.unet_seg import SegUNetConfig, seg_unet_apply
from topomap_tpu.utils.keras_ckpt import import_keras_seg_unet, read_keras_weights_h5


def build_multi_unet(n_classes=9, size=64, base=4):
    """The public multi_unet topology (double convs + dropout, Conv2DTranspose ups,
    1x1 softmax head) at a scaled-down width for test speed."""
    L = keras.layers
    inputs = L.Input((size, size, 3))
    chans = [base, base * 2, base * 4, base * 8]
    x = inputs
    skips = []
    for c in chans:
        x = L.Conv2D(c, 3, activation="relu", padding="same")(x)
        x = L.Dropout(0.1)(x)
        x = L.Conv2D(c, 3, activation="relu", padding="same")(x)
        skips.append(x)
        x = L.MaxPooling2D(2)(x)
    x = L.Conv2D(base * 16, 3, activation="relu", padding="same")(x)
    x = L.Dropout(0.3)(x)
    x = L.Conv2D(base * 16, 3, activation="relu", padding="same")(x)
    for c in reversed(chans):
        x = L.Conv2DTranspose(c, 2, strides=2, padding="same")(x)
        x = L.Concatenate()([x, skips.pop()])
        x = L.Conv2D(c, 3, activation="relu", padding="same")(x)
        x = L.Dropout(0.1)(x)
        x = L.Conv2D(c, 3, activation="relu", padding="same")(x)
    outputs = L.Conv2D(n_classes, 1, activation="softmax")(x)
    return keras.Model(inputs, outputs)


CFG = SegUNetConfig(base_channels=4, levels=4)


def _parity(params, model, size=64):
    rng = np.random.RandomState(0)
    img = rng.rand(2, size, size, 3).astype(np.float32)
    ours = np.asarray(jnp.asarray(seg_unet_apply(params, CFG, jnp.asarray(img))))
    ours_prob = np.exp(ours - ours.max(-1, keepdims=True))
    ours_prob /= ours_prob.sum(-1, keepdims=True)
    theirs = np.asarray(model.predict(img, verbose=0))
    np.testing.assert_allclose(ours_prob, theirs, atol=2e-5)


def test_import_from_get_weights_list():
    model = build_multi_unet()
    params = import_keras_seg_unet(model.get_weights(), CFG)
    _parity(params, model)


def test_import_from_weights_h5(tmp_path):
    model = build_multi_unet()
    path = tmp_path / "seg.weights.h5"
    model.save_weights(path)
    ws = read_keras_weights_h5(path)
    ref = model.get_weights()
    assert len(ws) == len(ref)
    for a, b in zip(ws, ref):
        np.testing.assert_array_equal(a, b)
    params = import_keras_seg_unet(str(path), CFG)
    _parity(params, model)


def test_wrong_count_raises():
    with pytest.raises(ValueError):
        import_keras_seg_unet([np.zeros((3, 3, 3, 4))], CFG)
