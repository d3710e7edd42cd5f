"""Online generation server (10th CLI — beyond the reference).

The reference's serving story is batch scripts over a dataset
(infer.py:65-110); production deployment needs an online endpoint. This
CLI loads the same bundle as ``cli.infer`` (LA-VAE + denoiser
checkpoints, reference .pth imports included) and exposes the
dynamic-batching ServingEngine (serving/engine.py) over a minimal
stdlib HTTP/JSON API — no extra dependencies:

    POST /generate  {"text_embedding": [..E floats..],
                     "out_length": L,            # admitted bucket
                     "cfg_scale": 7.0,           # optional, per request
                     "seed": 123}                # optional
        -> {"series": [[..]..], "seed": .., "latency_s": ..,
            "batch_size": .., "batched_with": ..}
    GET  /stats    -> engine throughput/latency/padding counters
    GET  /healthz  -> {"ok": true, "buckets": [..], "tiers": [..]}

Concurrent requests are micro-batched into fixed-shape compiled
programs by the engine; per-sample seeds/cfg make batching semantically
invisible (see serving/engine.py). The server threads only stage numpy
and block on futures — a single dispatcher thread owns the TPU.
"""

from __future__ import annotations

import argparse
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from t2ms_tpu.cli._common import build_denoiser, build_t2s_vae
from t2ms_tpu.config import denoiser_ckpt_dir, t2s_pretrained_dir
from t2ms_tpu.serving import EngineOverloaded, ServingEngine
from t2ms_tpu.training import checkpoints as ckpt


def get_args(argv=None):
    p = argparse.ArgumentParser(description="T2S/T2MS generation server")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8476)
    p.add_argument("--backbone", type=str, default="flowmatching")
    p.add_argument("--denoiser", type=str, default="DiT")
    p.add_argument("--solver", type=str, default="euler",
                   choices=["euler", "heun", "midpoint", "ddim"])
    p.add_argument("--total_step", type=int, default=100)
    p.add_argument("--sample_steps", type=int, default=0,
                   help="ddim only: sampling steps over the --total_step "
                        "schedule (0 = total_step)")
    p.add_argument("--cfg_scale", type=float, default=7.0,
                   help="default guidance scale (overridable per request)")
    p.add_argument("--buckets", type=str, default="96",
                   help="comma-separated admitted out_lengths; each costs "
                        "len(tiers) compiled programs (cached on disk)")
    p.add_argument("--tiers", type=str, default="1,4,16",
                   help="comma-separated fixed batch sizes")
    p.add_argument("--max_wait_ms", type=float, default=20.0,
                   help="deadline before a non-full batch launches")
    p.add_argument("--max_pending", type=int, default=4096,
                   help="admission control: queued requests beyond this "
                        "get HTTP 503 instead of growing host memory "
                        "(0 = unbounded)")
    p.add_argument("--warmup", type=lambda s: s not in ("0", "False"),
                   default=True, help="compile all programs at startup")
    p.add_argument("--save_path", type=str,
                   default="./results/denoiser_results")
    p.add_argument("--dataset_name", type=str, default="exchangerate_24")
    p.add_argument("--checkpoint_id", type=int, default=19999)
    p.add_argument("--checkpoint_file", type=str, default="")
    p.add_argument("--vae_file", type=str, default="")
    p.add_argument("--latent_grid", type=int, default=30)
    p.add_argument("--text_emb_dim", type=int, default=128)
    p.add_argument("--compute_dtype", type=str, default="bf16",
                   choices=["f32", "float32", "bf16", "bfloat16"],
                   help="bf16 is the measured TPU serving config "
                        "(BASELINE.md)")
    args = p.parse_args(argv)
    args.usepretrainedvae = True
    model_root = args.dataset_name.split("_")[0]
    args.checkpoint_path = args.checkpoint_file or os.path.join(
        denoiser_ckpt_dir(args.save_path, args.backbone, args.denoiser,
                          model_root),
        f"model_{args.checkpoint_id}")
    args.pretrained_model_path = args.vae_file or os.path.join(
        t2s_pretrained_dir(model_root), "final_model")
    return args


def load_bundle(args):
    """Load (vae, vae_params, denoiser, d_params) exactly as cli.infer
    does (reference .pth imports included), minus the dataset."""
    from t2ms_tpu.cli.infer import (_load_torch_denoiser_params,
                                    _load_torch_vae_params)
    buckets = [int(b) for b in str(args.buckets).split(",")]
    vae = build_t2s_vae(args)
    probe = jnp.zeros((2, max(buckets)))
    vae_params = vae.init(jax.random.key(0), probe)
    if args.pretrained_model_path.endswith(".pth") and \
            os.path.exists(args.pretrained_model_path):
        vae_params = _load_torch_vae_params(args.pretrained_model_path)
        print(f"Imported reference VAE from {args.pretrained_model_path}")
    elif os.path.exists(args.pretrained_model_path):
        vae_params = ckpt.load_params(args.pretrained_model_path, vae_params)
    else:
        print(f"WARNING: no pretrained VAE at "
              f"{args.pretrained_model_path}; serving random-init outputs")

    from t2ms_tpu.training.scaling import parse_dtype
    denoiser = build_denoiser(args.denoiser, latent_len=args.latent_grid,
                              latent_dim=64,
                              compute_dtype=parse_dtype(args.compute_dtype))
    z, _ = vae.apply(vae_params, probe, method=vae.encode)
    d_params = denoiser.init(jax.random.key(1), z, jnp.zeros(2),
                             jnp.zeros((2, args.text_emb_dim)))
    if args.checkpoint_path.endswith(".pth") and \
            os.path.exists(args.checkpoint_path):
        d_params = _load_torch_denoiser_params(args.checkpoint_path,
                                               args.denoiser)
        print(f"Imported reference denoiser from {args.checkpoint_path}")
    elif os.path.exists(args.checkpoint_path):
        restored = ckpt.load_train_ckpt(args.checkpoint_path, d_params, None)
        d_params = restored["params"]
        print(f"Loaded denoiser from {args.checkpoint_path}")
    else:
        print(f"WARNING: no checkpoint at {args.checkpoint_path}; "
              "serving random-init outputs")
    return vae, vae_params, denoiser, d_params, buckets


class _Handler(BaseHTTPRequestHandler):
    engine: ServingEngine = None
    meta: dict = None

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *a):  # quiet per-request stderr spam
        pass

    def do_GET(self):
        if self.path == "/healthz":
            self._json(200, dict(ok=True, **self.meta))
        elif self.path == "/stats":
            self._json(200, self.engine.stats())
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/generate":
            self._json(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            emb = np.asarray(req["text_embedding"], dtype=np.float32)
            fut = self.engine.submit(
                emb, int(req["out_length"]),
                cfg_scale=req.get("cfg_scale"),
                seed=req.get("seed"))
            r = fut.result(timeout=600.0)
        except EngineOverloaded as e:
            self._json(503, {"error": str(e)})
            return
        except (KeyError, ValueError, TypeError,
                json.JSONDecodeError) as e:
            self._json(400, {"error": str(e)})
            return
        except Exception as e:  # noqa: BLE001 - surface engine errors
            self._json(500, {"error": str(e)})
            return
        self._json(200, dict(
            series=np.asarray(r.series).tolist(), seed=r.seed,
            out_length=r.out_length, cfg_scale=r.cfg_scale,
            latency_s=r.latency_s, batch_size=r.batch_size,
            batched_with=r.batched_with))


def make_server(engine: ServingEngine, host: str, port: int,
                meta: dict = None) -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral) and return the server; caller runs
    ``serve_forever`` (or a thread for tests)."""
    handler = type("Handler", (_Handler,),
                   dict(engine=engine, meta=meta or {}))
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    args = get_args(argv)
    vae, vae_params, denoiser, d_params, buckets = load_bundle(args)
    tiers = [int(t) for t in str(args.tiers).split(",")]
    from t2ms_tpu.training.scaling import setup_scaling
    plan = setup_scaling(args, batch_size=max(tiers), for_training=False)
    if plan.n_data > 1:
        print(f"Serving plan: {plan.describe()}")
    engine = ServingEngine(
        denoiser, vae, d_params, vae_params, backbone=args.backbone,
        total_step=args.total_step, solver=args.solver,
        sample_steps=args.sample_steps or None,
        out_lengths=buckets, batch_tiers=tiers,
        max_wait_ms=args.max_wait_ms, default_cfg_scale=args.cfg_scale,
        text_emb_dim=args.text_emb_dim,
        scaling_plan=plan if plan.n_data > 1 else None,
        max_pending=args.max_pending or None)
    if args.warmup:
        print(f"Warming up {len(buckets) * len(tiers)} programs...")
        engine.warmup()
    server = make_server(engine, args.host, args.port,
                         meta=dict(buckets=buckets, tiers=tiers,
                                   solver=args.solver,
                                   total_step=args.total_step))
    print(f"Serving on http://{args.host}:{server.server_address[1]} "
          f"(buckets={buckets}, tiers={tiers}, "
          f"max_wait={args.max_wait_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        engine.close()


if __name__ == "__main__":
    main()
