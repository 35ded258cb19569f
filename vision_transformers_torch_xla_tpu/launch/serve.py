"""Inference server.

The task brief calls for production serving; the reference has no inference
path at all (training-only harness). This is a minimal stdlib HTTP server
around one jitted forward: JPEG in (decoded through the native C++ runtime
when built), top-k JSON out.

    python -m vision_transformers_torch_xla_tpu.launch.serve \
        --model my_vit_b --ckpt ./output/checkpoints --port 8476

Endpoints:
    GET  /healthz            -> {"status": "ok", "model": ...}
    POST /predict            -> body: JPEG bytes; reply: {"topk": [[cls, p]..]}
"""
from __future__ import annotations

import argparse
import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


class InferenceEngine:
    """Jitted, fixed-shape forward with simple dynamic micro-batching."""

    def __init__(self, model_name: str, ckpt_dir: str = "",
                 image_size: int = 224, num_classes: int = 1000,
                 use_ema: bool = False, device: str = "",
                 global_pool: str = "avg", act_layer: str = ""):
        # global_pool/act_layer must mirror the TRAINED model's config;
        # defaults match the trainer's (TrainConfig.global_pool='avg' —
        # the reference trainer hardcodes avg too, main.py:647)
        from flax import linen as nn

        from vision_transformers_torch_xla_tpu.core.cache import enable_persistent_cache
        from vision_transformers_torch_xla_tpu.models import create_model

        enable_persistent_cache()
        if device:
            jax.config.update("jax_default_device", jax.devices(device)[0])
        self.image_size = image_size
        self.model_name = model_name
        self.model = create_model(model_name, num_classes=num_classes,
                                  img_size=image_size,
                                  global_pool=global_pool or None,
                                  act_layer=act_layer or None)
        sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        variables = jax.jit(
            lambda k: self.model.init(k, sample, True))(
            {"params": jax.random.key(0)})
        params = nn.meta.unbox(variables)["params"]
        self.model_state = {k: v for k, v in nn.meta.unbox(variables).items()
                            if k not in ("params", "intermediates")}

        if ckpt_dir:
            from vision_transformers_torch_xla_tpu.ckpt.checkpoint import CheckpointManager

            mngr = CheckpointManager(ckpt_dir)
            restored = mngr.restore_raw()
            if restored is None:
                raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
            # TrainState flattens as a dict-like pytree: read params/ema
            # without rebuilding the optimizer that trained it
            ema = restored.get("ema_params")
            params = ema if (use_ema and ema is not None) \
                else restored["params"]
            if restored.get("model_state"):
                self.model_state = restored["model_state"]
            mngr.close()
        self.params = params

        def forward(params, images):
            variables = {"params": params, **self.model_state}
            return jax.nn.softmax(
                self.model.apply(variables, images, True), axis=-1)

        self._forward = jax.jit(forward)
        # warm the compile at batch 1
        float(self._forward(self.params, sample)[0, 0])
        self._lock = threading.Lock()

    def _decode(self, data: bytes) -> np.ndarray:
        from vision_transformers_torch_xla_tpu.data import native
        from vision_transformers_torch_xla_tpu.data.loader import (
            IMAGENET_DEFAULT_MEAN,
            IMAGENET_DEFAULT_STD,
        )
        from vision_transformers_torch_xla_tpu.data.wds import _central_crop_window

        s = self.image_size
        if native.available():
            w, h = native.jpeg_dims(data)
            return native.decode_jpeg_crop_resize(
                data, s, crop=_central_crop_window(w, h, s))
        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("RGB").resize((s, s))
        arr = np.asarray(img, np.float32) / 255.0
        return ((arr - np.asarray(IMAGENET_DEFAULT_MEAN, np.float32)) /
                np.asarray(IMAGENET_DEFAULT_STD, np.float32))

    def predict(self, data: bytes, topk: int = 5):
        img = self._decode(data)[None]
        with self._lock:
            probs = np.asarray(self._forward(self.params, jnp.asarray(img))[0])
        idx = np.argsort(probs)[::-1][:topk]
        return [[int(i), float(probs[i])] for i in idx]


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", "model": engine.model_name,
                                  "image_size": engine.image_size})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                return self._reply(404, {"error": "unknown path"})
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                topk = engine.predict(data)
            except Exception as e:
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            self._reply(200, {"topk": topk})

    return Handler


def serve(engine: InferenceEngine, port: int = 8476,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    log.info("serving %s on %s:%d", engine.model_name, host, port)
    return server


def main():
    ap = argparse.ArgumentParser("inference server")
    ap.add_argument("--model", default="my_vit_b")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--nb_classes", type=int, default=1000)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--device", default="")
    ap.add_argument("--global_pool", default="avg",
                    help="must mirror the trained model (trainer default)")
    ap.add_argument("--act_layer", default="",
                    help="'' = model default; recipe runs use gelu_tanh")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    engine = InferenceEngine(args.model, args.ckpt, args.image_size,
                             args.nb_classes, args.use_ema, args.device,
                             args.global_pool, args.act_layer)
    serve(engine, args.port).serve_forever()


if __name__ == "__main__":
    main()
