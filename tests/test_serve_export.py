"""Inference server + AOT export tests."""
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn


def _jpeg_bytes(size=64):
    from PIL import Image

    arr = (np.random.default_rng(0).random((size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    from vision_transformers_torch_xla_tpu.launch.serve import InferenceEngine, serve

    engine = InferenceEngine("vit_tiny_patch16_224", image_size=32,
                             num_classes=10, device="cpu")
    srv = serve(engine, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.load(r)
    assert body["status"] == "ok"
    assert body["model"] == "vit_tiny_patch16_224"


def test_predict_topk(server):
    req = urllib.request.Request(server + "/predict", data=_jpeg_bytes(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.load(r)
    topk = body["topk"]
    assert len(topk) == 5
    probs = [p for _, p in topk]
    assert all(0 <= p <= 1 for p in probs)
    assert probs == sorted(probs, reverse=True)


def test_predict_bad_payload_is_400(server):
    req = urllib.request.Request(server + "/predict", data=b"not an image",
                                 method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_export_roundtrip(tiny_model_kwargs):
    from vision_transformers_torch_xla_tpu.ckpt.export import (
        export_forward,
        load_forward,
    )
    from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer

    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    params = nn.meta.unbox(m.init({"params": jax.random.key(0)}, x, True))["params"]
    blob = export_forward(m, params, image_size=32, batch=1)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    fn = load_forward(bytes(blob))
    y = fn(params, x)
    ref = m.apply({"params": params}, x, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5)


def test_serve_from_checkpoint(tmp_path):
    """Engine restores params (incl. EMA) from an Orbax checkpoint dir."""
    from vision_transformers_torch_xla_tpu.core.config import TrainConfig
    from vision_transformers_torch_xla_tpu.launch import main as trainer
    from vision_transformers_torch_xla_tpu.launch.serve import InferenceEngine

    cfg = TrainConfig(model="vit_tiny_patch16_224", input_size=32,
                      nb_classes=10, data_set="synthetic", batch_size=8,
                      epochs=1, limit_steps_per_epoch=2, limit_eval_batches=1,
                      warmup_epochs=0, device="cpu", mesh_shape="data:1",
                      output_dir=str(tmp_path), save_ckpt=True, log_freq=1,
                      synthetic_val_size=16, model_ema=True)
    trainer.main(cfg)

    import os

    engine = InferenceEngine("vit_tiny_patch16_224",
                             ckpt_dir=os.path.join(tmp_path, "checkpoints"),
                             image_size=32, num_classes=10, use_ema=True,
                             device="cpu")
    topk = engine.predict(_jpeg_bytes(48))
    assert len(topk) == 5 and all(0 <= p <= 1 for _, p in topk)


def test_serve_missing_checkpoint_raises(tmp_path):
    from vision_transformers_torch_xla_tpu.launch.serve import InferenceEngine

    with pytest.raises(FileNotFoundError):
        InferenceEngine("vit_tiny_patch16_224", ckpt_dir=str(tmp_path / "nope"),
                        image_size=32, num_classes=10, device="cpu")
