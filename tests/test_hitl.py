"""HITL numerics: Dawid-Skene, GLAD, Elo, David's score, steepness, tiers."""
import numpy as np
import pytest

from lameness_tpu.hitl import elo
from lameness_tpu.hitl.dawid_skene import DawidSkene
from lameness_tpu.hitl.glad import GLAD
from lameness_tpu.hitl.reliability import (RaterReliabilityService,
                                           determine_tier)
from lameness_tpu.io.bus import MessageBus
from lameness_tpu.core.config import Subjects


def _synthetic_annotations(rng, n_items=30, good_raters=3, bad_raters=2,
                           good_acc=0.95, bad_acc=0.55):
    truth = {f"v{i}": int(rng.random() < 0.5) for i in range(n_items)}
    anns = {}
    for item, t in truth.items():
        anns[item] = {}
        for g in range(good_raters):
            lab = t if rng.random() < good_acc else 1 - t
            anns[item][f"good{g}"] = lab
        for b in range(bad_raters):
            lab = t if rng.random() < bad_acc else 1 - t
            anns[item][f"bad{b}"] = lab
    return truth, anns


def test_dawid_skene_recovers_truth_and_abilities(rng):
    truth, anns = _synthetic_annotations(rng)
    ds = DawidSkene()
    labels, confusions = ds.fit(anns)
    acc = np.mean([labels[k] == truth[k] for k in truth])
    assert acc >= 0.9
    good_ability = np.mean([ds.get_rater_ability(f"good{g}") for g in range(3)])
    bad_ability = np.mean([ds.get_rater_ability(f"bad{b}") for b in range(2)])
    assert good_ability > bad_ability
    assert good_ability > 0.85
    # confusion rows are distributions
    for cm in confusions.values():
        assert np.allclose(cm.sum(axis=1), 1.0, atol=1e-6)


def test_dawid_skene_empty():
    assert DawidSkene().fit({}) == ({}, {})


def test_glad_recovers_truth(rng):
    truth, anns = _synthetic_annotations(rng)
    labels, abilities, difficulties = GLAD().fit(anns)
    acc = np.mean([labels[k] == truth[k] for k in truth])
    assert acc >= 0.85
    assert np.mean([abilities[f"good{g}"] for g in range(3)]) > \
        np.mean([abilities[f"bad{b}"] for b in range(2)])
    assert all(0 < d <= 2.1 for d in difficulties.values())


# ------------------------------------------------------------------- Elo ---
def test_elo_expected_score_symmetry():
    assert elo.expected_score(1500, 1500) == 0.5
    assert elo.expected_score(1900, 1500) == pytest.approx(1 / (1 + 10 ** -1))
    assert elo.expected_score(1500, 1900) + elo.expected_score(1900, 1500) \
        == pytest.approx(1.0)


def test_elo_dynamic_k_factor():
    # fresh video, max uncertainty: k = 32 * 1 * 1 * (0.5+0.33) * 1
    assert elo.dynamic_k_factor(350.0, 0, degree=1) == \
        pytest.approx(32 * 0.83)
    # floor at 10
    assert elo.dynamic_k_factor(50.0, 99, degree=0, rater_weight=0.5) == 10.0
    # gold rater scales up
    assert elo.dynamic_k_factor(350.0, 0, 1, 1.5) == \
        pytest.approx(32 * 0.83 * 1.5)


def test_elo_update_ratings_moves_winner_up():
    ra, rb, ua, ub = elo.update_ratings(1500, 1500, 350, 350, 0, 0, winner=1)
    assert ra > 1500 > rb
    assert ua == pytest.approx(350 * 0.98)
    # tie leaves equal ratings unchanged
    ra2, rb2, _, _ = elo.update_ratings(1500, 1500, 350, 350, 0, 0, winner=0)
    assert ra2 == 1500 and rb2 == 1500


def test_davids_scores_ordering():
    # a beats b, b beats c, a beats c: clear hierarchy a > b > c
    comps = [
        {"video_id_1": "a", "video_id_2": "b", "winner": 1},
        {"video_id_1": "b", "video_id_2": "c", "winner": 1},
        {"video_id_1": "a", "video_id_2": "c", "winner": 1},
    ]
    ds = elo.davids_scores(comps)
    assert ds["a"] == 1.0 and ds["c"] == 0.0
    assert ds["a"] > ds["b"] > ds["c"]


def test_davids_scores_degree_weighting():
    comps_weak = [{"video_id_1": "a", "video_id_2": "b", "winner": 1,
                   "degree": 0},
                  {"video_id_1": "b", "video_id_2": "a", "winner": 1,
                   "degree": 3}]
    ds = elo.davids_scores(comps_weak)
    assert ds["b"] > ds["a"]     # stronger-preference win dominates


def test_steepness_linear_hierarchy():
    scores = {f"v{i}": 1.0 - i / 4 for i in range(5)}   # perfectly linear
    st, se = elo.steepness(scores)
    assert st == pytest.approx(1.0, abs=1e-6)
    assert se == pytest.approx(0.0, abs=1e-9)
    flat = {f"v{i}": 0.5 for i in range(5)}
    st2, _ = elo.steepness(flat)
    assert st2 == pytest.approx(0.0, abs=1e-9)
    assert elo.steepness({"a": 1.0}) == (0.0, 0.0)


def test_inter_rater_agreement():
    comps = [
        {"video_id_1": "a", "video_id_2": "b", "winner": 1},
        {"video_id_1": "b", "video_id_2": "a", "winner": 2},  # same verdict
        {"video_id_1": "a", "video_id_2": "c", "winner": 1},
        {"video_id_1": "a", "video_id_2": "c", "winner": 2},  # disagreement
    ]
    # pair (a,b): winners [1, 2] -> recorded raw; reference compares raw
    # winner codes, so [1, 2] disagree; pair (a,c): [1, 2] disagree too.
    agr = elo.inter_rater_agreement(comps)
    assert agr == 0.0
    comps2 = [{"video_id_1": "a", "video_id_2": "b", "winner": 1}] * 3
    assert elo.inter_rater_agreement(comps2) == 1.0


def test_active_next_pair_prefers_close_uncertain(rng):
    ratings = {"a": 1500.0, "b": 1505.0, "c": 2000.0}
    unc = {"a": 300.0, "b": 300.0, "c": 60.0}
    picks = set()
    g = np.random.default_rng(0)
    for _ in range(40):
        picks.add(tuple(sorted(elo.active_next_pair(ratings, unc, g))))
    assert ("a", "b") in picks   # the close uncertain pair dominates


# ----------------------------------------------------------- reliability ---
def test_tier_determination():
    assert determine_tier(0.9) == "gold"
    assert determine_tier(0.85) == "gold"
    assert determine_tier(0.75) == "silver"
    assert determine_tier(0.5) == "bronze"


def test_reliability_service_end_to_end(tmp_path, rng):
    bus = MessageBus()
    got = []
    bus.subscribe_sync("rater.reliability.updated", lambda m: got.append(m))
    svc = RaterReliabilityService(tmp_path, bus=bus, subjects=Subjects())
    svc.add_gold_task("g1", 1)
    svc.add_gold_task("g2", 0)
    # rater r1 annotates gold tasks correctly via comparisons
    svc.handle_comparison_submitted(
        {"video_id_1": "g1", "video_id_2": "g2", "rater_id": "r1", "winner": 1})
    assert got and got[-1]["rater_id"] == "r1"
    stats = svc.rater_stats["r1"]
    assert stats.gold_task_accuracy == 1.0
    assert stats.tier == "gold"
    consensus = svc.compute_weighted_consensus("g1")
    assert consensus.estimated_label == 1
    assert consensus.num_raters == 1
    # persistence round trip (reference 3-file layout)
    svc2 = RaterReliabilityService(tmp_path)
    assert svc2.gold_tasks == {"g1": 1, "g2": 0}
    assert svc2.annotations["g1"]["r1"] == 1
    assert svc2.rater_stats["r1"].tier == "gold"
