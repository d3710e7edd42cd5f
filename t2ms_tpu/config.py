"""Config system: YAML + argparse merge with reference-compatible flattening.

The reference layers config.yaml onto argparse via utils.get_cfg
(reference utils.py:38-60), flattening per-sport keys
(features/flow_dim/input_dim/dataset/vae/diffusion) into the args namespace,
and derives checkpoint/generation directories from
``{backbone}_{denoiser}_{dataset}_{caption}_{epoch}`` tuples
(train.py:153-157, mytrain.py:115-116, infer.py:144-146, myinfer.py:240-243).
We keep those flag names and path schemas for CLI compatibility.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict, Optional

import yaml

__all__ = ["get_cfg", "denoiser_ckpt_dir", "generation_dir",
           "t2s_pretrained_dir", "motion_pretrained_dir", "FrameworkConfig",
           "env_flag", "enable_persistent_compilation_cache"]


def env_flag(name: str) -> bool:
    """Boolean env var: '0', 'false', 'no', 'off' and '' are False —
    a bare truthiness check would read T2MS_NAN_CHECK=0 as enabled."""
    return os.environ.get(name, "").strip().lower() not in (
        "", "0", "false", "no", "off")


def _host_fingerprint() -> str:
    """Short digest of the host CPU identity (arch + feature flags) for
    the compilation-cache path — see enable_persistent_compilation_cache."""
    import hashlib
    import platform
    bits = platform.machine()
    try:
        with open("/proc/cpuinfo", encoding="utf-8") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(bits.encode()).hexdigest()[:10]


def enable_persistent_compilation_cache() -> Optional[str]:
    """Turn on JAX's persistent XLA compilation cache (compile each
    program once per MACHINE, not once per process).

    Through the axon tunnel a cold compile of the accum-scan train
    program costs ~5-15 min (CLAUDE.md); the reference pays torch's
    eager warmup instead. With the cache, every re-run — CLI restarts,
    resumed sweeps, repeated bench/gate invocations — loads the
    compiled executable from disk in seconds. The cache key includes
    the HLO, compile options and backend version, so it is safe across
    code changes (changed programs miss and recompile).

    Called once at package import. Opt out with T2MS_NO_COMPILE_CACHE=1;
    relocate with T2MS_COMPILE_CACHE_DIR. Returns the cache dir or None
    if disabled/unavailable (failure is never fatal — the cache is an
    optimization, not a dependency)."""
    if env_flag("T2MS_NO_COMPILE_CACHE"):
        return None
    path = os.environ.get("T2MS_COMPILE_CACHE_DIR")
    if path is None:
        # Host-CPU fingerprint in the path: cached executables are
        # machine code, and this VM's disk survives migrations/reboots
        # onto hosts with different CPU features — a cache written on
        # one host reloading on another is a SIGILL hazard (observed
        # twice: cpu_aot_loader feature-mismatch errors from pre-reboot
        # entries, 2026-08-19). A host change now simply starts a fresh
        # cache dir. Explicit T2MS_COMPILE_CACHE_DIR is used verbatim.
        path = os.path.expanduser(
            f"~/.cache/t2ms_tpu/xla_cache-{_host_fingerprint()}")
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default threshold (1 s) skips the tiny per-bucket resize
        # programs; anything slower than 2 s is worth a disk entry
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        # cache the jax-level serialized executables only: XLA:CPU's AOT
        # entries embed host machine features and reload with
        # "could lead to SIGILL" feature-mismatch errors even on the
        # SAME machine (observed here: +prefer-no-scatter pseudo-features
        # in the compile set but not the host set)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # noqa: BLE001 - old jax / RO filesystem / etc.
        return None
    return path


def get_cfg(args: argparse.Namespace) -> argparse.Namespace:
    """Merge the per-sport YAML section into ``args``. Mirrors reference
    utils.py:38-60 (same keys, same defaults)."""
    with open(args.config, "r", encoding="utf-8") as f:
        config = yaml.safe_load(f)
    args.dataset_root = config.get("dataset_root", "./Data")
    args.general_seed = config.get("general_seed", 2025)

    cfg = config[args.dataset_name]
    args.features = [feature[0]["name"] for feature in cfg["features"].values()]
    args.flow_dim = cfg.get("flow_dim", 128)
    args.input_dim = cfg.get("input_dim", 10)
    args.split_base_num = cfg["dataset"].get("split_base_num", 36)
    args.caption = cfg["dataset"].get("caption", "Caption_explain_no_barbell")

    vae = cfg.get("vae", {})
    args.d_ff = vae.get("d_ff", 64)
    args.num_encoder_layers = vae.get("num_encoder_layers", 128)
    args.num_decoder_layers = vae.get("num_decoder_layers", 128)
    args.num_heads = vae.get("num_heads", 8)
    args.embedding_dim = vae.get("embedding_dim", 64)
    args.pretrained_epc = vae.get("epoch", 80000)
    # conv-VAE keys (deadlift section of reference config.yaml:96-98)
    args.block_hidden_size = vae.get("block_hidden_size", 128)
    args.num_residual_layers = vae.get("num_residual_layers", 3)
    args.res_hidden_size = vae.get("res_hidden_size", 256)

    diff = cfg.get("diffusion", {})
    args.denoiser = diff.get("denoiser", "DiT")
    args.backbone = diff.get("backbone", "flowmatching")
    return args


# ---------------------------------------------------------------------------
# Reference-compatible path derivation (the convention-over-configuration
# scheme the reference CLIs rely on).
# ---------------------------------------------------------------------------

def denoiser_ckpt_dir(save_path: str, backbone: str, denoiser: str,
                      dataset_name: str, caption: Optional[str] = None,
                      pretrained_epc: Optional[int] = None) -> str:
    """T2S: {save}/checkpoints/{backbone}_{denoiser}_{dataset} (train.py:157).
    T2MS adds _{caption}_{pretrained_epc} (mytrain.py:115)."""
    if caption is None:
        name = f"{backbone}_{denoiser}_{dataset_name}"
    else:
        name = f"{backbone}_{denoiser}_{dataset_name}_{caption}_{pretrained_epc}"
    return os.path.join(save_path, "checkpoints", name)


def generation_dir(save_path: str, backbone: str, denoiser: str,
                   dataset_name: str, cfg_scale, total_step) -> str:
    """{save}/generation/{backbone}_{denoiser}_{dataset}_{cfg}_{steps}
    (infer.py:146, myinfer.py:243)."""
    name = f"{backbone}_{denoiser}_{dataset_name}_{cfg_scale}_{total_step}"
    return os.path.join(save_path, "generation", name)


def t2s_pretrained_dir(dataset_name: str, epochs: int = 2000) -> str:
    """VAE dir for the T2S track: results/saved_pretrained_models/
    dataset{root}_epoch{N}/final_model (train.py:155-156)."""
    root = dataset_name.split("_")[0]
    return os.path.join("results", "saved_pretrained_models",
                        f"dataset{root}_epoch{epochs}")


def motion_pretrained_dir(split_base_num: int, dataset_name: str,
                          pretrained_epc: int) -> str:
    """VAE dir for the motion track: {split}_{sport}_epoch{N}
    (mytrain.py:116)."""
    return os.path.join("results", "saved_pretrained_models",
                        f"{split_base_num}_{dataset_name}_epoch{pretrained_epc}")


# ---------------------------------------------------------------------------
# Framework-level config (new, TPU-specific knobs; everything defaulted so the
# reference CLI surface is unchanged).
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FrameworkConfig:
    """TPU execution knobs shared by trainers and samplers."""
    mesh_shape: Dict[str, int] = dataclasses.field(
        default_factory=lambda: {"data": -1, "model": 1})
    compute_dtype: str = "bfloat16"   # matmul/activation dtype on TPU
    param_dtype: str = "float32"
    donate_state: bool = True
    profile_dir: Optional[str] = None  # jax.profiler trace output
    nan_check: bool = False            # jax.debug NaN checking

    @classmethod
    def from_env(cls) -> "FrameworkConfig":
        cfg = cls()
        if os.environ.get("T2MS_PROFILE_DIR"):
            cfg.profile_dir = os.environ["T2MS_PROFILE_DIR"]
        if env_flag("T2MS_NAN_CHECK"):
            cfg.nan_check = True
        if os.environ.get("T2MS_COMPUTE_DTYPE"):
            cfg.compute_dtype = os.environ["T2MS_COMPUTE_DTYPE"]
        return cfg
