"""CLI serving precision: ComputeConfig.dtype drives the bf16 engine
policy on TPU backends; --f32 and CPU backends keep exact f32."""
import argparse

import jax
import jax.numpy as jnp
import pytest


def _args(**kw):
    ns = argparse.Namespace(data=None, cpu=False, f32=False, small=True)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _leaf_dtype(engine):
    leaves = jax.tree_util.tree_leaves(engine.params["yolo"])
    return {l.dtype for l in leaves if hasattr(l, "dtype")}


def test_build_applies_bf16_on_tpu(monkeypatch, tmp_path):
    from lameness_tpu import __main__ as cli
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    _, engine, _ = cli._build(_args(data=str(tmp_path / "d")))
    assert engine.spec.dtype == jnp.bfloat16
    assert jnp.dtype(jnp.bfloat16) in _leaf_dtype(engine)


def test_build_f32_flag_opts_out(monkeypatch, tmp_path):
    from lameness_tpu import __main__ as cli
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    _, engine, _ = cli._build(_args(data=str(tmp_path / "d"), f32=True))
    assert engine.spec.dtype == jnp.float32
    assert _leaf_dtype(engine) == {jnp.dtype("float32")}


def test_build_cpu_stays_f32(tmp_path):
    from lameness_tpu import __main__ as cli
    _, engine, _ = cli._build(_args(data=str(tmp_path / "d")))
    assert engine.spec.dtype == jnp.float32


def test_ingest_spec_env(monkeypatch):
    """LAMENESS_INGEST=WxH builds a reduced-geometry spec; unset keeps
    the canonical 1280x720."""
    from lameness_tpu.__main__ import ingest_spec
    monkeypatch.delenv("LAMENESS_INGEST", raising=False)
    s = ingest_spec()
    assert (s.frame_width, s.frame_height) == (1280, 720)
    monkeypatch.setenv("LAMENESS_INGEST", "1024x576")
    s = ingest_spec()
    assert (s.frame_width, s.frame_height) == (1024, 576)
    # packed frame subset is geometry-independent (clip_frames/fps only)
    from lameness_tpu.pipeline.engine import EngineSpec
    assert s.n_packed == EngineSpec().n_packed
