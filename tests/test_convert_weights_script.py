"""convert_weights CLI: torch-file loading + orbax round trip."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from scripts.convert_weights import load_torch_file


def test_load_torch_plain_state_dict(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"a.weight": torch.ones(3, 4), "b.bias": torch.zeros(2)}
    f = tmp_path / "w.pt"
    torch.save(sd, f)
    out = load_torch_file(f)
    assert set(out) == {"a.weight", "b.bias"}
    assert out["a.weight"].shape == (3, 4)
    assert isinstance(out["a.weight"], np.ndarray)


def test_load_torch_nested_state_dict(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {"state_dict": {"x": torch.full((2,), 5.0)}}
    f = tmp_path / "n.pt"
    torch.save(sd, f)
    out = load_torch_file(f)
    assert list(out) == ["x"]
    assert out["x"][0] == 5.0


@pytest.mark.slow
def test_yolo_convert_save_restore_roundtrip(tmp_path):
    """Ultralytics-format dict -> our params -> orbax -> load_params."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from lameness_tpu.models.yolo import (YoloV8, convert_ultralytics_state_dict,
                                          init_params)
    from lameness_tpu.pipeline.checkpoint import load_params, save_params

    # build a fake ultralytics state dict by inverting our converter's
    # expectations: round-trip our own random params through the
    # bijection test helper is already covered in test_yolo; here we
    # exercise the orbax path end to end with our params directly.
    model = YoloV8(variant="n", num_classes=1)
    params = init_params(model, img=64)
    save_params(tmp_path, "yolo", params)
    restored = load_params(tmp_path, "yolo", params)
    assert restored is not None
    a = jnp.concatenate([x.ravel() for x in
                         __import__("jax").tree.leaves(params)])
    b = jnp.concatenate([x.ravel() for x in
                         __import__("jax").tree.leaves(restored)])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
