"""Round-5 curation transfer/caching: I420 wire mode for the batched
curation detector (same default + env contract as engine ingest), the
pipelined detect_stream loop, and the one-video decoded-frame cache that
canonical/backup extraction and the driver's preprocess crop reuse
(reference decodes the same upload once per service — SURVEY.md §3.1;
here the full chain decodes it ONCE)."""
import numpy as np
import pytest

import jax

from lameness_tpu.core.config import Config, DataDirs
from lameness_tpu.models.yolo import YoloV8, init_params
from lameness_tpu.video.curation import BatchedYoloDetector, ClipCurator
from lameness_tpu.video.decode import VideoReader, write_video
from lameness_tpu.video.yuv import i420_to_rgb_device, rgb_to_i420


@pytest.fixture(scope="module")
def tiny_yolo():
    model = YoloV8(variant="n", num_classes=8)
    params = init_params(model, jax.random.PRNGKey(0), img=64)
    return model, params


@pytest.fixture(scope="module")
def frames():
    import cv2
    rng = np.random.default_rng(11)
    out = []
    for _ in range(21):
        base = rng.uniform(0, 255, (6, 8, 3)).astype(np.float32)
        out.append(cv2.resize(base, (96, 72),
                              interpolation=cv2.INTER_CUBIC
                              ).clip(0, 255).astype(np.uint8))
    return np.stack(out)                        # RGB, even dims (I420-able)


def test_yuv_transfer_exact_vs_device_roundtrip(tiny_yolo, frames):
    """detect_batch(transfer='yuv420') must equal the rgb path fed the
    device-side I420 round trip of the same frames — the wire format is a
    transfer encoding, not a different detector."""
    model, params = tiny_yolo
    det_yuv = BatchedYoloDetector(model, params, conf=0.0, cow_class_id=2,
                                  size=64, chunk=8, transfer="yuv420")
    det_rgb = BatchedYoloDetector(model, params, conf=0.0, cow_class_id=2,
                                  size=64, chunk=8, transfer="rgb")
    got = det_yuv.detect_batch(frames, bgr=False)
    roundtrip = np.asarray(i420_to_rgb_device(rgb_to_i420(frames)))
    want = det_rgb.detect_batch(roundtrip, bgr=False)
    assert len(got) == len(want) == len(frames)
    for i, (g, w) in enumerate(zip(got, want)):
        assert (g is None) == (w is None), i
        if g is not None:
            np.testing.assert_allclose(g["bbox"], w["bbox"], atol=1e-5,
                                       err_msg=str(i))
            np.testing.assert_allclose(g["confidence"], w["confidence"],
                                       atol=1e-6)
    # 21 frames, chunk 8 -> 3 dispatches each
    assert det_yuv.dispatches == det_rgb.dispatches == 3


def test_yuv_transfer_default_and_env(tiny_yolo, monkeypatch):
    """CPU backend defaults to rgb (bit-exact tests stay exact);
    LAMENESS_YUV_INGEST=1 forces I420, =0 forces rgb; odd geometry
    always falls back to rgb (I420 cannot represent it)."""
    model, params = tiny_yolo
    det = BatchedYoloDetector(model, params, size=64)
    assert det._resolve_transfer(72, 96) == "rgb"      # cpu default
    monkeypatch.setenv("LAMENESS_YUV_INGEST", "1")
    assert det._resolve_transfer(72, 96) == "yuv420"
    assert det._resolve_transfer(71, 96) == "rgb"      # odd H
    monkeypatch.setenv("LAMENESS_YUV_INGEST", "0")
    assert det._resolve_transfer(72, 96) == "rgb"
    monkeypatch.delenv("LAMENESS_YUV_INGEST")
    det2 = BatchedYoloDetector(model, params, size=64, transfer="yuv420")
    assert det2._resolve_transfer(72, 96) == "yuv420"  # explicit wins


def test_chunk_default_resolution(tiny_yolo, monkeypatch):
    """Default chunk: 16 on CPU (bit-exact test parity), 48 on TPU
    (~64 MB I420 puts restore the tunnel's full link rate —
    docs/PROBES_r03.json ld_put_idle); LAMENESS_CURATION_CHUNK wins."""
    model, params = tiny_yolo
    assert BatchedYoloDetector(model, params, size=64).chunk == 16
    monkeypatch.setenv("LAMENESS_CURATION_CHUNK", "24")
    assert BatchedYoloDetector(model, params, size=64).chunk == 24
    monkeypatch.delenv("LAMENESS_CURATION_CHUNK")
    assert BatchedYoloDetector(model, params, size=64, chunk=4).chunk == 4


def _walking_video(tmp_path, n=140, h=72, w=96):
    rng = np.random.default_rng(7)
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        x = int(5 + (w - 25) * i / (n - 1))
        frames[i] = rng.integers(0, 20, (h, w, 3), np.uint8)
        frames[i, 20:50, x:x + 18] = 230
    video = tmp_path / "walk.mp4"
    assert write_video(video, list(frames), 25)
    return video


def _decode_all(path):
    with VideoReader(path) as vr:
        return np.stack([f for _, f in vr.frames(rgb=True)])


def test_frame_cache_identical_outputs(tiny_yolo, tmp_path, monkeypatch):
    """curate_video with the decoded-frame cache vs with the cache
    disabled (cap 0): identical quality report and identical canonical
    clip pixels — the cache is a decode-elision, never a behavior
    change."""
    model, params = tiny_yolo
    video = _walking_video(tmp_path)

    def run(sub):
        dirs = DataDirs(root=str(tmp_path / sub))
        cur = ClipCurator(dirs, detector=BatchedYoloDetector(
            model, params, conf=0.0, cow_class_id=2, size=64, chunk=16))
        rep = cur.curate_video(video, "vid1")
        return cur, rep, dirs.canonical / "vid1_canonical.mp4"

    cur_c, rep_c, clip_c = run("cached")
    assert cur_c._frame_cache is not None \
        and cur_c._frame_cache["frames"] is not None
    monkeypatch.setenv("LAMENESS_FRAME_CACHE_MB", "0")
    cur_n, rep_n, clip_n = run("nocache")
    assert cur_n._frame_cache is None
    for k in ("passes", "selected_window", "backup_window", "status"):
        assert rep_c[k] == rep_n[k], k
    np.testing.assert_array_equal(_decode_all(clip_c), _decode_all(clip_n))


def test_take_frame_cache_contract(tiny_yolo, tmp_path):
    model, params = tiny_yolo
    video = _walking_video(tmp_path, n=40)
    dirs = DataDirs(root=str(tmp_path / "d"))
    cur = ClipCurator(dirs, detector=BatchedYoloDetector(
        model, params, conf=0.0, cow_class_id=2, size=64, chunk=16))
    cur.curate_video(video, "vid1")
    assert cur.take_frame_cache(tmp_path / "other.mp4") is None  # wrong path pops
    cur.curate_video(video, "vid1")
    fc = cur.take_frame_cache(video)
    assert fc is not None and len(fc["frames"]) == 40
    assert fc["info"]["total_frames"] == 40
    assert cur.take_frame_cache(video) is None                   # popped


def test_streamed_track_device_error_propagates(tmp_path):
    """A device-loop failure mid-stream must raise promptly on the
    calling thread — not wedge the producer on the bounded queue."""
    class ExplodingDetector:
        chunk = 4

        def detect_stream(self, chunk_iter, timers=None):
            next(iter(chunk_iter))
            raise RuntimeError("device died")

        def __call__(self, frame):      # Detector protocol
            return None

    video = _walking_video(tmp_path, n=40)
    cur = ClipCurator(DataDirs(root=str(tmp_path / "d")),
                      detector=ExplodingDetector())
    t0 = __import__("time").time()
    with pytest.raises(RuntimeError, match="device died"):
        cur.track_cow_through_video(video)
    assert __import__("time").time() - t0 < 30


def test_preprocess_reuses_cache_identically(tmp_path, monkeypatch):
    """driver.preprocess from the curation frame cache vs from its own
    decode: identical crop box and identical cropped-clip pixels."""
    from lameness_tpu.serve.driver import PipelineDriver

    video = _walking_video(tmp_path, n=60)

    def run(sub):
        cfg = Config.load(data_root=str(tmp_path / sub))
        cfg.dirs.ensure()
        drv = PipelineDriver(config=cfg)        # motion-fallback curator
        vid = drv.ingest(video, video_id="v1")
        raw = next(iter(drv.dirs.videos.glob("v1.*")))
        drv.curator.curate_video(raw, vid)
        payload = drv.preprocess(vid)
        return payload, drv

    pay_c, drv_c = run("cached")
    monkeypatch.setenv("LAMENESS_FRAME_CACHE_MB", "0")
    pay_n, _ = run("nocache")
    assert pay_c["crop_box"] == pay_n["crop_box"]
    np.testing.assert_array_equal(
        _decode_all(pay_c["processed_path"]),
        _decode_all(pay_n["processed_path"]))
    # the cache was popped by preprocess (memory freed)
    assert drv_c.curator._frame_cache is None
