"""Pure-numpy GBDT readers: exactness on hand-built reference-format files.

The reference loads xgboost_latest.json / lightgbm_latest.txt /
catboost_latest.cbm at startup (services/ml-pipeline/app/main.py:72-114).
These tests hand-build tiny model files in both text formats and check
margin-exact evaluation plus the ensemble's preference for them.
"""
import json

import numpy as np
import pytest

from lameness_tpu.ml.gbdt_io import (LgbTextModel, XgbJsonModel,
                                     load_reference_model)


# ---------------------------------------------------------------------------
# hand-built xgboost JSON: 2 trees, binary:logistic, base_score 0.5
#
# tree0:          node0: x[0] < 1.0 ?
#                /                    \
#          leaf +0.4               node2: x[1] < -0.5 ?
#                                  /            \
#                             leaf -0.3      leaf +0.1
# tree1:          node0: x[1] < 2.0 ?  (default right for NaN)
#                /                    \
#          leaf +0.25              leaf -0.15
# ---------------------------------------------------------------------------
def _xgb_doc():
    t0 = {
        "left_children": [1, -1, 3, -1, -1],
        "right_children": [2, -1, 4, -1, -1],
        "split_indices": [0, 0, 1, 0, 0],
        "split_conditions": [1.0, 0.4, -0.5, -0.3, 0.1],
        "default_left": [1, 0, 1, 0, 0],
    }
    t1 = {
        "left_children": [1, -1, -1],
        "right_children": [2, -1, -1],
        "split_indices": [1, 0, 0],
        "split_conditions": [2.0, 0.25, -0.15],
        "default_left": [0, 0, 0],
    }
    return {"learner": {
        "gradient_booster": {"model": {"trees": [t0, t1],
                                       "tree_info": [0, 0]}},
        "learner_model_param": {"base_score": "5E-1", "num_class": "0",
                                "num_feature": "2"},
        "objective": {"name": "binary:logistic"},
    }, "version": [1, 7, 6]}


def test_xgb_json_margin_exact(tmp_path):
    p = tmp_path / "xgboost_latest.json"
    p.write_text(json.dumps(_xgb_doc()))
    m = XgbJsonModel(p)
    x = np.array([[0.5, 0.0],     # t0: left leaf +0.4 ; t1: left +0.25
                  [2.0, -1.0],    # t0: right,then left -0.3 ; t1: +0.25
                  [2.0, 3.0]])    # t0: right,right +0.1 ; t1: right -0.15
    margins = m.predict_margin(x)
    expect = np.array([0.4 + 0.25, -0.3 + 0.25, 0.1 - 0.15])
    np.testing.assert_allclose(margins, expect, rtol=0, atol=1e-12)
    proba = m.predict_proba(x)
    np.testing.assert_allclose(proba[:, 1], 1 / (1 + np.exp(-expect)),
                               atol=1e-12)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-12)


def test_xgb_json_nan_default_direction(tmp_path):
    p = tmp_path / "xgboost_latest.json"
    p.write_text(json.dumps(_xgb_doc()))
    m = XgbJsonModel(p)
    # x0 NaN at tree0 root (default_left=1 -> +0.4);
    # x1 NaN at tree1 root (default_left=0 -> right -0.15)
    margins = m.predict_margin(np.array([[np.nan, np.nan]]))
    np.testing.assert_allclose(margins, [0.4 - 0.15], atol=1e-12)


def test_xgb_nondefault_base_score(tmp_path):
    doc = _xgb_doc()
    doc["learner"]["learner_model_param"]["base_score"] = "0.2"
    p = tmp_path / "m.json"
    p.write_text(json.dumps(doc))
    m = XgbJsonModel(p)
    x = np.array([[0.5, 0.0]])
    margin = 0.4 + 0.25 + np.log(0.2 / 0.8)
    np.testing.assert_allclose(m.predict_proba(x)[0, 1],
                               1 / (1 + np.exp(-margin)), atol=1e-12)


# ---------------------------------------------------------------------------
# hand-built LightGBM text model: 2 trees + a constant tree
#
# tree0: node0: x[1] <= 0.5 -> leaf0 (+0.2) else node1: x[0] <= 1.5
#        -> leaf1 (-0.1) else leaf2 (+0.35)
# tree1: node0: x[0] <= -1.0 -> leaf0 (-0.05) else leaf1 (+0.15)
# tree2: constant leaf  (+0.01)
# ---------------------------------------------------------------------------
_LGB_TEXT = """tree
version=v3
num_class=1
num_tree_per_iteration=1
label_index=0
max_feature_idx=1
objective=binary sigmoid:1
feature_names=f0 f1
feature_infos=none none

Tree=0
num_leaves=3
num_cat=0
split_feature=1 0
split_gain=10 5
threshold=0.5 1.5
decision_type=2 2
left_child=-1 -2
right_child=1 -3
leaf_value=0.2 -0.1 0.35
leaf_weight=1 1 1
leaf_count=1 1 1
internal_value=0 0
internal_weight=0 0
internal_count=2 2
is_linear=0
shrinkage=0.1

Tree=1
num_leaves=2
num_cat=0
split_feature=0
split_gain=3
threshold=-1.0
decision_type=2
left_child=-1
right_child=-2
leaf_value=-0.05 0.15
leaf_weight=1 1
leaf_count=1 1
internal_value=0
internal_weight=0
internal_count=2
is_linear=0
shrinkage=0.1

Tree=2
num_leaves=1
num_cat=0
leaf_value=0.01
is_linear=0
shrinkage=1

end of trees

feature_importances:
f0=1

parameters:
[boosting: gbdt]

end of parameters
"""


def test_lgb_text_margin_exact(tmp_path):
    p = tmp_path / "lightgbm_latest.txt"
    p.write_text(_LGB_TEXT)
    m = LgbTextModel(p)
    assert len(m.trees) == 3
    x = np.array([[0.0, 0.0],    # t0: leaf0 +0.2 ; t1: right +0.15
                  [1.0, 1.0],    # t0: node1 left -0.1 ; t1: right +0.15
                  [2.0, 1.0],    # t0: node1 right +0.35 ; t1: right +0.15
                  [-2.0, 1.0]])  # t0: node1 left -0.1 ; t1: left -0.05
    margins = m.predict_margin(x)
    expect = np.array([0.2 + 0.15, -0.1 + 0.15, 0.35 + 0.15,
                       -0.1 - 0.05]) + 0.01
    np.testing.assert_allclose(margins, expect, atol=1e-12)
    proba = m.predict_proba(x)
    np.testing.assert_allclose(proba[:, 1], 1 / (1 + np.exp(-expect)),
                               atol=1e-12)


def test_lgb_missing_none_nan_becomes_zero(tmp_path):
    p = tmp_path / "m.txt"
    # decision_type 2 -> numerical, default LEFT (bit1), missing None:
    # LightGBM's NumericalDecision converts NaN to 0.0 when missing_type
    # is not NaN, THEN compares x <= threshold (it does NOT take the
    # default direction).
    p.write_text(_LGB_TEXT)
    m = LgbTextModel(p)
    margins = m.predict_margin(np.array([[np.nan, np.nan]]))
    # t0 root: 0.0 <= 0.5 -> left leaf0 +0.2
    # t1 root: 0.0 <= -1.0 false -> right +0.15
    np.testing.assert_allclose(margins, [0.2 + 0.15 + 0.01], atol=1e-12)


def test_lgb_missing_nan_goes_default(tmp_path):
    p = tmp_path / "m.txt"
    # missing_type NaN: decision_type = bit1 (default-left) | 2<<2 = 10
    p.write_text(_LGB_TEXT.replace("decision_type=2 2",
                                   "decision_type=10 10")
                 .replace("decision_type=2\n", "decision_type=10\n"))
    m = LgbTextModel(p)
    margins = m.predict_margin(np.array([[np.nan, np.nan]]))
    # t0 root: NaN missing -> default-left -> leaf0 +0.2
    # t1 root: NaN missing -> default-left -> -0.05
    np.testing.assert_allclose(margins, [0.2 - 0.05 + 0.01], atol=1e-12)
    # non-NaN values still compare numerically under missing_type NaN
    margins = m.predict_margin(np.array([[2.0, 1.0]]))
    np.testing.assert_allclose(margins, [0.35 + 0.15 + 0.01], atol=1e-12)


def test_lgb_sigmoid_scale(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text(_LGB_TEXT.replace("sigmoid:1", "sigmoid:2"))
    m = LgbTextModel(p)
    x = np.array([[0.0, 0.0]])
    margin = 0.2 + 0.15 + 0.01
    np.testing.assert_allclose(m.predict_proba(x)[0, 1],
                               1 / (1 + np.exp(-2 * margin)), atol=1e-12)


# ---------------------------------------------------------------------------
# ensemble integration: reference files preferred over sklearn stand-ins
# ---------------------------------------------------------------------------
def test_ensemble_prefers_reference_files(tmp_path):
    from lameness_tpu.ml.ensemble import GBDTEnsemble
    (tmp_path / "xgboost_latest.json").write_text(json.dumps(_xgb_doc()))
    (tmp_path / "lightgbm_latest.txt").write_text(_LGB_TEXT)
    ens = GBDTEnsemble(tmp_path)
    assert type(ens.models["xgboost"]).__name__ == "XgbJsonModel"
    assert type(ens.models["lightgbm"]).__name__ == "LgbTextModel"
    out = ens.predict(np.array([0.5, 0.0]))
    # per-slot probabilities exactly the numpy readers' outputs
    np.testing.assert_allclose(
        out["xgboost"]["probability"],
        1 / (1 + np.exp(-(0.4 + 0.25))), atol=1e-12)
    np.testing.assert_allclose(
        out["lightgbm"]["probability"],
        1 / (1 + np.exp(-(0.2 + 0.15 + 0.01))), atol=1e-12)
    assert "ensemble" in out and 0.0 < out["ensemble"]["probability"] < 1.0


def test_load_reference_model_absent(tmp_path):
    assert load_reference_model(tmp_path, "xgboost") is None
    assert load_reference_model(tmp_path, "catboost") is None
