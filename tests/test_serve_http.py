"""HTTP serving front-end (cli.serve): endpoint contract, concurrent
clients micro-batched by the engine, error paths, and the CLI arg
surface. Runs an in-process ThreadingHTTPServer on an ephemeral port —
purely loopback, no network."""

import json
import time
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2ms_tpu.cli.serve import get_args, make_server
from t2ms_tpu.models.denoisers import DiT
from t2ms_tpu.models.vae import LAVAE
from t2ms_tpu.serving import ServingEngine


@pytest.fixture(scope="module")
def http_ctx():
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=16,
                num_residual_hiddens=16, embedding_dim=8)
    x = jax.random.normal(jax.random.key(0), (2, 24))
    vp = vae.init(jax.random.key(1), x)
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=1, num_heads=2)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(2), z, jnp.zeros(2), jnp.zeros((2, 32)))
    engine = ServingEngine(dit, vae, dp, vp, total_step=3,
                           out_lengths=(24,), batch_tiers=(1, 2, 4),
                           max_wait_ms=10.0, text_emb_dim=32)
    server = make_server(engine, "127.0.0.1", 0,
                         meta=dict(buckets=[24], tiers=[1, 2, 4]))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url
    server.shutdown()
    server.server_close()
    engine.close()


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return json.loads(r.read())


def test_healthz_and_stats(http_ctx):
    h = _get(http_ctx, "/healthz")
    assert h["ok"] and h["buckets"] == [24]
    s = _get(http_ctx, "/stats")
    assert set(s) >= {"requests", "batches", "padding_fraction"}


def test_generate_roundtrip_and_determinism(http_ctx):
    emb = [0.1] * 32
    r1 = _post(http_ctx, dict(text_embedding=emb, out_length=24,
                              cfg_scale=3.0, seed=7))
    assert r1["seed"] == 7 and r1["out_length"] == 24
    series = np.asarray(r1["series"], dtype=np.float32)
    assert series.shape[-1] == 24 and np.isfinite(series).all()
    # same seed+cfg+emb -> identical series regardless of batch history
    r2 = _post(http_ctx, dict(text_embedding=emb, out_length=24,
                              cfg_scale=3.0, seed=7))
    np.testing.assert_allclose(np.asarray(r2["series"]), series,
                               rtol=1e-4, atol=1e-5)


def test_concurrent_clients_get_batched(http_ctx):
    outs = {}

    def client(i):
        outs[i] = _post(http_ctx, dict(
            text_embedding=list(np.linspace(0, 1, 32) * (i + 1)),
            out_length=24, seed=50 + i))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(outs) == [0, 1, 2, 3]
    assert all(np.isfinite(np.asarray(o["series"])).all()
               for o in outs.values())
    # distinct inputs must give distinct outputs
    assert not np.allclose(outs[0]["series"], outs[3]["series"])


def test_bad_requests_are_4xx(http_ctx):
    for payload in (dict(text_embedding=[0.0] * 32, out_length=999),
                    dict(text_embedding=[0.0] * 5, out_length=24),
                    dict(out_length=24)):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(http_ctx, payload)
        assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(http_ctx, "/nope")
    assert e.value.code == 404


def test_get_args_surface():
    a = get_args(["--buckets", "24,96", "--tiers", "1,8",
                  "--port", "0", "--total_step", "5"])
    assert a.buckets == "24,96" and a.total_step == 5
    assert a.checkpoint_path and a.pretrained_model_path


def test_load_bundle_random_init(tmp_path, capsys):
    """Without checkpoints on disk, load_bundle builds the T2S-scale
    bundle from the deterministic random init (warning, not a crash) and
    parses the bucket list."""
    from t2ms_tpu.cli.serve import load_bundle
    a = get_args(["--buckets", "24,48", "--save_path", str(tmp_path),
                  "--total_step", "2"])
    vae, vp, dit, dp, buckets = load_bundle(a)
    assert buckets == [24, 48]
    z, _ = vae.apply(vp, jnp.zeros((1, 48)), method=vae.encode)
    assert z.shape == (1, 64, 30)
    out = dit.apply(dp, z, jnp.zeros(1), jnp.zeros((1, 128)))
    assert out.shape == z.shape
    assert "WARNING" in capsys.readouterr().out


def test_overload_returns_503():
    """Admission control surfaces as HTTP 503 (engine queue full)."""
    vae = LAVAE(in_channels=1, latent_grid=6, num_hiddens=16,
                num_residual_hiddens=16, embedding_dim=8)
    x = jax.random.normal(jax.random.key(0), (2, 24))
    vp = vae.init(jax.random.key(1), x)
    dit = DiT(latent_len=6, latent_dim=8, d_model=32, depth=1, num_heads=2)
    z, _ = vae.apply(vp, x, method=vae.encode)
    dp = dit.init(jax.random.key(2), z, jnp.zeros(2), jnp.zeros((2, 32)))
    # tier 4 can never fill and the deadline is far: submits stay queued
    engine = ServingEngine(dit, vae, dp, vp, total_step=2,
                           out_lengths=(24,), batch_tiers=(4,),
                           max_wait_ms=60_000.0, text_emb_dim=32,
                           max_pending=1)
    server = make_server(engine, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        payload = dict(text_embedding=[0.0] * 32, out_length=24)
        # first request parks in the queue on a server thread
        first = threading.Thread(target=lambda: _post(url, payload),
                                 daemon=True)
        first.start()
        deadline = time.monotonic() + 10
        while engine.stats()["requests"] < 1:
            assert time.monotonic() < deadline, "first request never queued"
            time.sleep(0.01)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, payload)
        assert e.value.code == 503
    finally:
        server.shutdown()
        server.server_close()
        engine.close()          # drains the parked request
        first.join(timeout=30)
