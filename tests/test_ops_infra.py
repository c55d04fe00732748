"""Ops/infra file contracts: compose topology + TPU overlay + the CI/CD
workflow set (analogs of the reference's docker-compose.gpu.yml and its
four .github/workflows: ci, deploy, build-gpu-images, gpu-toggle).

No docker/gh runner exists in this image, so these are structural
checks: YAML validity, the service/job graphs, and the knobs the docs
promise (JAX_PLATFORM build arg, tpu_worker_count toggle var).
"""
import pathlib
import re

import yaml

REPO = pathlib.Path(__file__).resolve().parents[1]


def _load(path):
    with open(path) as f:
        return yaml.safe_load(f)


def _on(workflow):
    # YAML 1.1 parses the bare key `on` as boolean True
    return workflow.get("on", workflow.get(True))


# -- compose ------------------------------------------------------------------
def test_compose_base_topology():
    c = _load(REPO / "deploy" / "docker-compose.yml")
    assert set(c["services"]) == {"nats", "qdrant", "app"}
    app = c["services"]["app"]
    assert set(app["depends_on"]) == {"nats", "qdrant"}
    assert any(":8000" in p for p in app["ports"])
    # wire servers run the first-party protocol entrypoints
    assert "nats-server" in c["services"]["nats"]["command"]
    assert "qdrant-server" in c["services"]["qdrant"]["command"]


def test_compose_tpu_overlay():
    base = _load(REPO / "deploy" / "docker-compose.yml")
    tpu = _load(REPO / "deploy" / "docker-compose.tpu.yml")
    # overlay services either override a base service or add the worker
    assert set(tpu["services"]) == {"app", "worker"}
    for name, svc in tpu["services"].items():
        assert svc["privileged"] is True, name
        assert svc["build"]["args"]["JAX_PLATFORM"] == "tpu", name
        assert svc["environment"]["JAX_PLATFORMS"] == "tpu", name
    assert "app" in base["services"]
    w = tpu["services"]["worker"]
    assert "worker" in w["command"] and "--nats-url" in w["command"]
    # the overlay's app command keeps serving the admin API
    assert "serve" in tpu["services"]["app"]["command"]


def test_dockerfile_platform_arg():
    text = (REPO / "Dockerfile").read_text()
    assert "ARG JAX_PLATFORM=cpu" in text
    assert "jax[tpu]" in text and "jax[cpu]" in text
    assert "libtpu_releases.html" in text


# -- workflows ----------------------------------------------------------------
def test_workflow_set_matches_reference():
    """The reference ships ci / deploy / build-gpu-images / gpu-toggle;
    every capability has an analog here."""
    d = REPO / ".github" / "workflows"
    names = {p.name for p in d.glob("*.yml")}
    assert {"ci.yml", "deploy.yml", "build-images.yml",
            "tpu-toggle.yml"} <= names
    for p in d.glob("*.yml"):
        wf = _load(p)
        assert wf.get("jobs"), p.name
        assert _on(wf), p.name


def test_deploy_workflow_job_graph():
    wf = _load(REPO / ".github" / "workflows" / "deploy.yml")
    jobs = wf["jobs"]
    assert list(jobs) == ["build-and-push", "terraform-plan",
                          "terraform-apply", "roll-services", "notify"]
    assert jobs["terraform-plan"]["needs"] == "build-and-push"
    assert jobs["terraform-apply"]["needs"] == "terraform-plan"
    # apply is gated on the production environment + main branch
    assert jobs["terraform-apply"]["environment"] == "production"
    assert "refs/heads/main" in jobs["terraform-apply"]["if"]
    # plan/apply operate on the checked-in stack
    text = (REPO / ".github" / "workflows" / "deploy.yml").read_text()
    for wd in re.findall(r"working-directory:\s*(\S+)", text):
        assert (REPO / wd).is_dir(), wd
    # dispatch offers the reference's environment choice
    dispatch = _on(wf)["workflow_dispatch"]
    assert dispatch["inputs"]["environment"]["options"] == [
        "production", "staging"]


def test_tpu_toggle_workflow():
    wf = _load(REPO / ".github" / "workflows" / "tpu-toggle.yml")
    dispatch = _on(wf)["workflow_dispatch"]
    assert dispatch["inputs"]["action"]["options"] == ["enable", "disable"]
    text = (REPO / ".github" / "workflows" / "tpu-toggle.yml").read_text()
    # the toggle drives the terraform count the stack actually defines
    assert "tpu_worker_count" in text
    tf_vars = (REPO / "deploy" / "terraform" / "variables.tf").read_text()
    assert 'variable "tpu_worker_count"' in tf_vars


def test_build_images_matrix():
    wf = _load(REPO / ".github" / "workflows" / "build-images.yml")
    matrix = wf["jobs"]["build-images"]["strategy"]["matrix"]
    assert matrix["platform"] == ["cpu", "tpu"]
    text = (REPO / ".github" / "workflows" / "build-images.yml").read_text()
    assert "JAX_PLATFORM=${{ matrix.platform }}" in text
