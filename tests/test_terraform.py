"""IaC layer sanity: deploy/terraform mirrors the reference's module
split (/root/reference/terraform/modules/*) for a TPU-VM deployment.

No terraform binary ships in this image, so this is `terraform validate`
-level checking in pure python: HCL block/brace/string balance (with
${...} interpolation handling), module-source resolution, variable
declaration coverage per directory, cross-module output references, and
templatefile() path existence.
"""
import re
from pathlib import Path

TF_ROOT = Path(__file__).parent.parent / "deploy" / "terraform"

# the reference's module set -> our analog (gpu_worker -> tpu_worker,
# ecs -> services)
EXPECTED_MODULES = {"networking", "storage", "database", "secrets",
                    "services", "tpu_worker", "load_balancer"}


def _tf_files():
    return sorted(TF_ROOT.rglob("*.tf"))


def test_layout_mirrors_reference():
    assert (TF_ROOT / "main.tf").exists()
    assert (TF_ROOT / "variables.tf").exists()
    assert (TF_ROOT / "outputs.tf").exists()
    mods = {p.name for p in (TF_ROOT / "modules").iterdir() if p.is_dir()}
    assert mods == EXPECTED_MODULES, mods ^ EXPECTED_MODULES
    for m in mods:
        d = TF_ROOT / "modules" / m
        assert (d / "main.tf").exists(), m
        assert (d / "variables.tf").exists(), m
        assert (d / "outputs.tf").exists(), m


def _check_hcl_balance(src: str, name: str):
    """Braces/brackets/parens balance outside strings; strings terminate;
    ${...} interpolations inside strings balance."""
    stack = []
    pairs = {"}": "{", "]": "[", ")": "("}
    mode = []                     # "s" = in string, int = interp depth base
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        top = mode[-1] if mode else None
        if top == "comment":
            if c == "\n":
                mode.pop()
        elif top == "s":
            if c == "\\":
                i += 1
            elif c == '"':
                mode.pop()
            elif src.startswith("${", i):
                mode.append(len(stack))
                i += 1
        elif isinstance(top, int):            # inside ${...}
            if c == '"':
                mode.append("s")
            elif c in "{[(":
                stack.append(c)
            elif c in "}])":
                if c == "}" and len(stack) == top:
                    mode.pop()                # interpolation closes
                else:
                    assert stack and stack[-1] == pairs[c], \
                        f"{name}: mismatched {c} at {i}"
                    stack.pop()
        else:
            if c == "#" or src.startswith("//", i):
                mode.append("comment")
            elif c == '"':
                mode.append("s")
            elif c in "{[(":
                stack.append(c)
            elif c in "}])":
                assert stack and stack[-1] == pairs[c], \
                    f"{name}: mismatched {c} at offset {i}"
                stack.pop()
        i += 1
    assert not stack, f"{name}: unclosed {stack}"
    assert not mode, f"{name}: unterminated {mode}"


def test_hcl_balance_all_files():
    for p in _tf_files():
        _check_hcl_balance(p.read_text(), str(p.relative_to(TF_ROOT)))


def _strip_strings(src: str) -> str:
    return re.sub(r'"(?:\\.|[^"\\])*"', '""', src)


def test_module_sources_resolve():
    src = (TF_ROOT / "main.tf").read_text()
    blocks = re.findall(r'module\s+"(\w+)"\s*\{([^}]*?)source\s*=\s*"([^"]+)"',
                        src, re.S)
    assert {b[0] for b in blocks} == EXPECTED_MODULES
    for _, _, path in blocks:
        assert (TF_ROOT / path).is_dir(), path


def test_vars_used_are_declared_per_directory():
    dirs = [TF_ROOT] + [TF_ROOT / "modules" / m for m in EXPECTED_MODULES]
    for d in dirs:
        declared = set()
        for p in d.glob("*.tf"):
            declared |= set(re.findall(r'variable\s+"(\w+)"', p.read_text()))
        used = set()
        for p in d.glob("*.tf"):
            used |= set(re.findall(r"var\.(\w+)", p.read_text()))
        assert used <= declared, (d.name, used - declared)


def test_module_output_references_exist():
    src = (TF_ROOT / "main.tf").read_text() \
        + (TF_ROOT / "outputs.tf").read_text()
    for mod, out in set(re.findall(r"module\.(\w+)\.(\w+)", src)):
        outs = (TF_ROOT / "modules" / mod / "outputs.tf").read_text()
        assert re.search(rf'output\s+"{out}"', outs), (mod, out)


def test_templatefile_paths_exist():
    for p in _tf_files():
        for tpl in re.findall(r'templatefile\("\$\{path\.module\}/([^"]+)"',
                              p.read_text()):
            assert (p.parent / tpl).exists(), (p.name, tpl)
        # templatefile vars: every ${x} placeholder in the template is
        # supplied in the call's map
        for tpl, body in re.findall(
                r'templatefile\("\$\{path\.module\}/([^"]+)",\s*\{(.*?)\}\)',
                p.read_text(), re.S):
            supplied = set(re.findall(r"(\w+)\s*=", body))
            tpl_src = (p.parent / tpl).read_text()
            # strip heredoc-quoted blocks? ${...} in shell heredocs with
            # 'quoted' delimiters are literal — keep the check simple and
            # only require referenced simple placeholders
            needed = set(re.findall(r"\$\{(\w+)\}", tpl_src))
            assert needed <= supplied, (tpl, needed - supplied)


def test_deploy_doc_references_terraform():
    doc = (Path(__file__).parent.parent / "docs" / "DEPLOY.md").read_text()
    assert "deploy/terraform" in doc
