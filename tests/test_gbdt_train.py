"""Numpy GBDT TRAINING in each reference library's style + format export.

The reference trains CatBoost/XGBoost/LightGBM
(services/training-service/app/main.py:193-293) and loads the saved
boosters in its ml-pipeline (services/ml-pipeline/app/main.py:72-114).
gbdt_train implements each library's algorithm in numpy and exports the
xgboost-JSON / lightgbm-text model formats; these tests pin learning
quality, exact save→load round-trips through the gbdt_io readers, sklearn
API compatibility, and the ensemble integration (training writes
xgboost_latest.json / lightgbm_latest.txt and a fresh load prefers them
with identical predictions).
"""
import numpy as np
import pytest

from lameness_tpu.ml.ensemble import GBDTEnsemble
from lameness_tpu.ml.gbdt_io import LgbTextModel, XgbJsonModel
from lameness_tpu.ml.gbdt_train import (BoostedTreesClassifier,
                                        make_numpy_model)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 300
    x = rng.normal(size=(n, 6))
    y = ((x[:, 0] - 0.7 * x[:, 2] + 0.4 * x[:, 4] ** 2
          + 0.3 * rng.normal(size=n)) > 0.2).astype(int)
    q = np.vstack([x, rng.normal(size=(100, 6))])   # train + novel queries
    return x, y, q


@pytest.mark.parametrize("growth", ["depthwise", "leafwise", "oblivious"])
def test_learns_separable(data, growth):
    x, y, _ = data
    m = BoostedTreesClassifier(n_estimators=60, max_depth=4, num_leaves=15,
                               growth=growth)
    m.fit(x, y)
    assert (m.predict(x) == y).mean() > 0.95
    proba = m.predict_proba(x)
    assert proba.shape == (len(y), 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-12)


def test_xgboost_json_roundtrip_exact(data, tmp_path):
    x, y, q = data
    m = make_numpy_model("xgboost", {"n_estimators": 40, "max_depth": 4})
    m.fit(x, y)
    path = tmp_path / "xgboost_latest.json"
    m.save_xgboost_json(path, feature_names=[f"feat{i}" for i in range(6)])
    r = XgbJsonModel(path)
    np.testing.assert_array_equal(r.predict_proba(q), m.predict_proba(q))
    # margins too (the reader sums leaf values before the base offset)
    np.testing.assert_allclose(r.predict_margin(q) + r._base_margin(),
                               m.predict_margin(q), atol=1e-12)


def test_lightgbm_txt_roundtrip_exact(data, tmp_path):
    x, y, q = data
    m = make_numpy_model("lightgbm", {"n_estimators": 40, "max_depth": 6,
                                      "num_leaves": 15})
    m.fit(x, y)
    path = tmp_path / "lightgbm_latest.txt"
    m.save_lightgbm_txt(path)
    r = LgbTextModel(path)
    np.testing.assert_array_equal(r.predict_proba(q), m.predict_proba(q))


def test_leafwise_respects_num_leaves(data):
    x, y, _ = data
    m = BoostedTreesClassifier(n_estimators=5, growth="leafwise",
                               num_leaves=4, max_depth=0)
    m.fit(x, y)
    for tree in m.trees_:
        leaves = 0
        stack = [tree]
        while stack:
            nd = stack.pop()
            if nd.is_leaf:
                leaves += 1
            else:
                stack.extend([nd.left, nd.right])
        assert leaves <= 4


def test_oblivious_trees_are_symmetric(data):
    """Every level of a CatBoost-style tree applies ONE shared condition."""
    x, y, _ = data
    m = BoostedTreesClassifier(n_estimators=3, growth="oblivious",
                               max_depth=3)
    m.fit(x, y)
    for tree in m.trees_:
        level = [tree]
        while level and not level[0].is_leaf:
            conds = {(nd.feat, nd.thr) for nd in level if not nd.is_leaf}
            assert len(conds) == 1
            nxt = []
            for nd in level:
                if not nd.is_leaf:
                    nxt.extend([nd.left, nd.right])
            level = nxt


def test_sklearn_api(data):
    from sklearn.base import clone
    from sklearn.model_selection import cross_val_score
    x, y, _ = data
    est = BoostedTreesClassifier(n_estimators=20, max_depth=3)
    clone(est)                                       # get_params round-trip
    scores = cross_val_score(est, x, y, cv=3, scoring="accuracy")
    assert scores.mean() > 0.8


def test_deterministic(data, tmp_path):
    x, y, _ = data
    files = []
    for i in range(2):
        m = make_numpy_model("xgboost", {"n_estimators": 10})
        m.fit(x, y)
        p = tmp_path / f"m{i}.json"
        m.save_xgboost_json(p)
        files.append(p.read_text())
    assert files[0] == files[1]


def test_degenerate_inputs():
    m = BoostedTreesClassifier(n_estimators=5)
    with pytest.raises(ValueError):                 # one class
        m.fit(np.zeros((4, 2)), np.zeros(4))
    with pytest.raises(ValueError):                 # non-finite
        m.fit(np.full((4, 2), np.nan), np.array([0, 1, 0, 1]))
    # constant features: no split exists -> single constant tree, p=prior
    x = np.ones((10, 3))
    y = np.array([0, 1] * 5)
    m.fit(x, y)
    assert len(m.trees_) == 1
    assert np.all(np.abs(m.predict_proba(x)[:, 1] - 0.5) < 0.1)


def test_ensemble_trains_numpy_and_writes_reference_formats(data, tmp_path):
    """Without the native libs, fit() trains the numpy models and save()
    writes the reference's own model files; a FRESH ensemble prefers them
    (gbdt_io readers) and predicts identically."""
    x, y, q = data
    ens = GBDTEnsemble(tmp_path)
    report = ens.fit(x, y, cv_folds=3,
                     feature_names=[f"feat{i}" for i in range(6)])
    assert (tmp_path / "xgboost_latest.json").exists()
    assert (tmp_path / "lightgbm_latest.txt").exists()
    backends = {s: report["models"][s]["backend"] for s in report["models"]}
    assert backends["xgboost"] == "BoostedTreesClassifier"
    assert backends["lightgbm"] == "BoostedTreesClassifier"
    assert backends["catboost"] == "BoostedTreesClassifier"
    before = {s: ens.models[s].predict_proba(q[:5])[0, 1]
              for s in ("xgboost", "lightgbm")}
    fresh = GBDTEnsemble(tmp_path)
    assert isinstance(fresh.models["xgboost"], XgbJsonModel)
    assert isinstance(fresh.models["lightgbm"], LgbTextModel)
    for s, p in before.items():
        assert fresh.models[s].predict_proba(q[:5])[0, 1] == p
    # the full predict() contract still works over the reloaded trio
    pred = fresh.predict(q[0])
    assert set(pred) >= {"xgboost", "lightgbm", "catboost", "ensemble"}


def test_subsample_and_colsample(data, tmp_path):
    """Row/feature sampling knobs apply (ml-config subsample /
    colsample_bytree) and the sampled model still round-trips exactly."""
    x, y, q = data
    m = BoostedTreesClassifier(n_estimators=40, max_depth=4,
                               subsample=0.7, colsample_bytree=0.5,
                               random_state=7)
    m.fit(x, y)
    assert (m.predict(x) == y).mean() > 0.85
    # feature restriction is real: with colsample 0.5 of 6 features, at
    # least one tree must skip the dominant feature 0
    used0 = [any(_uses_feature(t, 0) for t in [tree])
             for tree in m.trees_ if not tree.is_leaf]
    assert not all(used0)
    p = tmp_path / "sampled.json"
    m.save_xgboost_json(p)
    r = XgbJsonModel(p)
    np.testing.assert_array_equal(r.predict_proba(q), m.predict_proba(q))
    # same seed => identical model; different seed => different trees
    m2 = BoostedTreesClassifier(n_estimators=40, max_depth=4,
                                subsample=0.7, colsample_bytree=0.5,
                                random_state=7).fit(x, y)
    np.testing.assert_array_equal(m2.predict_margin(q), m.predict_margin(q))
    m3 = BoostedTreesClassifier(n_estimators=40, max_depth=4,
                                subsample=0.7, colsample_bytree=0.5,
                                random_state=8).fit(x, y)
    assert not np.array_equal(m3.predict_margin(q), m.predict_margin(q))


def _uses_feature(node, j):
    if node.is_leaf:
        return False
    return node.feat == j or _uses_feature(node.left, j) \
        or _uses_feature(node.right, j)


def test_catboost_json_roundtrip_exact(data, tmp_path):
    """The oblivious model's CatBoost-JSON export round-trips exactly
    through gbdt_io.CatboostJsonModel, including the base margin in
    scale_and_bias."""
    from lameness_tpu.ml.gbdt_io import CatboostJsonModel
    x, y, q = data
    m = make_numpy_model("catboost", {"n_estimators": 30, "max_depth": 4})
    m.fit(x, y)
    p = tmp_path / "catboost_latest.json"
    m.save_catboost_json(p, feature_names=[f"feat{i}" for i in range(6)])
    r = CatboostJsonModel(p)
    np.testing.assert_allclose(r.predict_margin(q), m.predict_margin(q),
                               atol=1e-12)
    np.testing.assert_allclose(r.predict_proba(q), m.predict_proba(q),
                               atol=1e-12)
    # depthwise models can't export this format
    md = make_numpy_model("xgboost", {"n_estimators": 3})
    md.fit(x, y)
    with pytest.raises(ValueError):
        md.save_catboost_json(tmp_path / "nope.json")


def test_ensemble_catboost_json_persistence(data, tmp_path):
    """fit() writes catboost_latest.json and a fresh load prefers it
    (no catboost lib in this image), predicting identically."""
    from lameness_tpu.ml.gbdt_io import CatboostJsonModel
    x, y, q = data
    ens = GBDTEnsemble(tmp_path)
    ens.fit(x, y, cv_folds=3)
    assert (tmp_path / "catboost_latest.json").exists()
    before = ens.models["catboost"].predict_proba(q[:5])[:, 1]
    fresh = GBDTEnsemble(tmp_path)
    assert isinstance(fresh.models["catboost"], CatboostJsonModel)
    np.testing.assert_allclose(
        fresh.models["catboost"].predict_proba(q[:5])[:, 1], before,
        atol=1e-12)


def test_leafwise_min_data_in_leaf(data):
    """LightGBM's count-based leaf constraint (library default 20, our
    default 1 — docs/TRAINING.md deviations): every leaf must hold at
    least min_data_in_leaf training samples, and the ml-config alias
    min_child_samples maps onto it."""
    x, y, _ = data
    m = BoostedTreesClassifier(n_estimators=5, growth="leafwise",
                               num_leaves=31, max_depth=0,
                               min_data_in_leaf=20)
    m.fit(x, y)
    saw_split = False
    for tree in m.trees_:
        stack = [tree]
        while stack:
            nd = stack.pop()
            if nd.is_leaf:
                assert nd.count >= 20, nd.count
            else:
                saw_split = True
                stack.extend([nd.left, nd.right])
    assert saw_split          # 300 samples: splits must still happen
    via_alias = make_numpy_model("lightgbm", {"min_child_samples": 20})
    assert via_alias.min_data_in_leaf == 20
    default = make_numpy_model("lightgbm", {})
    assert default.min_data_in_leaf == 1
