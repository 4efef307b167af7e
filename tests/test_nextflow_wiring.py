"""Semantic wiring lint of the Nextflow pipeline (no nextflow binary here).

test_nextflow_lint.py checks the Groovy at the token level; this module
parses the DSL2 wiring the way `nextflow lint` would surface the classic
refactor breakages (reference contract: nextflow/mantis-v2.nf):

- every ``params.X`` reference is declared (main script or nextflow.config);
- every required param has a fail-fast guard in the entry workflow;
- every workflow call passes exactly its ``take:`` arity;
- every ``X.done`` consumer names an ``emit:`` of the producing workflow;
- every process call inside a module workflow matches its ``input:`` arity;
- the step chain is threaded: each step's trigger is the previous step's
  ``done`` emission, pinning the documented directory/step order.
"""

from __future__ import annotations

import re
from pathlib import Path

from tests.test_nextflow_lint import strip_groovy

NF_DIR = Path(__file__).parents[1] / "nextflow"
MAIN = NF_DIR / "biahub-tpu.nf"
MODULES = sorted((NF_DIR / "modules").glob("*.nf"))


def _stripped(path: Path) -> str:
    return strip_groovy(path.read_text(), str(path))


def _block(code: str, header_re: str) -> dict[str, str]:
    """Map name -> balanced-brace body for each `header NAME {` match."""
    out = {}
    for m in re.finditer(header_re, code, re.MULTILINE):
        name = m.group(1)
        i = code.index("{", m.end() - 1)
        depth, j = 0, i
        while j < len(code):
            if code[j] == "{":
                depth += 1
            elif code[j] == "}":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        out[name] = code[i + 1 : j]
    return out


def _section(body: str, name: str) -> str:
    """The `name:` section of a process/workflow body, up to the next
    section label or the end."""
    m = re.search(rf"^\s*{name}:\s*$", body, re.MULTILINE)
    if not m:
        return ""
    rest = body[m.end() :]
    nxt = re.search(
        r"^\s*(take|main|emit|input|output|script|shell|exec|when|stub):\s*$",
        rest,
        re.MULTILINE,
    )
    return rest[: nxt.start()] if nxt else rest


def _workflow_signatures(code: str):
    """name -> (take arity, emit names) for each named workflow."""
    sigs = {}
    for name, body in _block(code, r"^\s*workflow\s+(\w+)\s*\{").items():
        take = [
            ln.strip()
            for ln in _section(body, "take").splitlines()
            if ln.strip()
        ]
        emits = [
            ln.split("=")[0].strip()
            for ln in _section(body, "emit").splitlines()
            if ln.strip()
        ]
        sigs[name] = (len(take), set(emits))
    return sigs


def _process_signatures(code: str):
    """name -> input arity (a tuple declaration counts as one channel)."""
    sigs = {}
    for name, body in _block(code, r"^\s*process\s+(\w+)\s*\{").items():
        decls = [
            ln.strip()
            for ln in _section(body, "input").splitlines()
            if re.match(r"\s*(val|tuple|path|file|env|each|stdin)\b", ln)
        ]
        sigs[name] = len(decls)
    return sigs


def _call_args(code: str, fname: str) -> list[list[str]]:
    """Top-level argument lists of every `fname(...)` call in ``code``."""
    calls = []
    for m in re.finditer(rf"\b{fname}\s*\(", code):
        i = m.end() - 1
        depth, j, args, start = 0, i, [], i + 1
        while j < len(code):
            ch = code[j]
            if ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                args.append(code[start:j].strip())
                start = j + 1
            j += 1
        last = code[start:j].strip()
        if last:
            args.append(last)
        calls.append(args)
    return calls


ALL_SIGS = {}
ALL_PROCS = {}
for _p in [MAIN, *MODULES]:
    _c = _stripped(_p)
    ALL_SIGS.update(_workflow_signatures(_c))
    ALL_PROCS.update(_process_signatures(_c))


def test_params_all_declared():
    """Every params.X referenced anywhere is assigned in the main script or
    nextflow.config — an undeclared param is silently null at runtime."""
    declared = set()
    for path in (MAIN, NF_DIR / "nextflow.config"):
        declared |= set(
            re.findall(r"params\.(\w+)\s*=", _stripped(path))
        )
        # params { x = ... } config block form
        cfg_params = _block(_stripped(path), r"^\s*(params)\s*\{").get(
            "params", ""
        )
        declared |= set(re.findall(r"^\s*(\w+)\s*=", cfg_params, re.MULTILINE))
    referenced = set()
    for path in [MAIN, *MODULES, NF_DIR / "nextflow.config"]:
        referenced |= set(re.findall(r"params\.(\w+)", _stripped(path)))
    missing = referenced - declared
    assert not missing, f"params referenced but never declared: {sorted(missing)}"


def test_required_params_guarded():
    """Every null-defaulted param the pipeline needs has a fail-fast guard
    (raw text: the error message lives in a string literal)."""
    raw = MAIN.read_text()
    nullable = set(re.findall(r"params\.(\w+)\s*=\s*null", raw))
    # tpu_coordinator is genuinely optional (single-host default).
    required = nullable - {"tpu_coordinator", "biahub_project"}
    for name in sorted(required):
        assert re.search(
            rf"if\s*\(\s*!params\.{name}\s*\)\s*error", raw
        ), f"required param {name} has no fail-fast guard"


def test_workflow_call_arity():
    """Each workflow invocation passes exactly its take: arity."""
    for path in [MAIN, *MODULES]:
        code = _stripped(path)
        for name, (arity, _) in ALL_SIGS.items():
            for args in _call_args(code, name):
                assert len(args) == arity, (
                    f"{path.name}: {name}(...) got {len(args)} args, "
                    f"take: declares {arity} ({args})"
                )


def test_done_emissions_exist():
    """Every `X_done.done` consumer names an emit of some workflow, and
    every *_wf emits `done` (the chain trigger contract)."""
    for name, (_, emits) in ALL_SIGS.items():
        if name.endswith("_wf"):
            assert "done" in emits, f"{name} does not emit 'done'"
    main = _stripped(MAIN)
    for var in re.findall(r"(\w+)\.done\b", main):
        assert var.endswith("_done"), (
            f".done read from {var!r} — not a step-result variable"
        )


def test_process_call_arity():
    """Process invocations inside module workflows match input: arity."""
    for path in MODULES:
        code = _stripped(path)
        for proc, arity in _process_signatures(code).items():
            for args in _call_args(code, proc):
                assert len(args) == arity, (
                    f"{path.name}: {proc}(...) got {len(args)} args, "
                    f"input: declares {arity} channels"
                )


def test_step_chain_threaded():
    """The main workflow threads each step's trigger from the previous
    step's done — the documented flat-field -> deskew -> reconstruct ->
    virtual-stain -> assemble -> track order."""
    main = _stripped(MAIN)
    chain = [
        ("flat_field_wf", None),
        ("deskew_wf", "ff_done"),
        ("reconstruct_wf", "deskew_done"),
        ("virtual_stain_wf", "reconstruct_done"),
        ("assemble_wf", "virtual_stain_done"),
        ("tracking_wf", "assemble_done"),
    ]
    for name, trigger in chain:
        calls = _call_args(main, name)
        assert calls, f"{name} is never called"
        if trigger is not None:
            assert any(f"{trigger}.done" in a for a in calls[0]), (
                f"{name} is not triggered by {trigger}.done: {calls[0]}"
            )


def test_wiring_linter_catches_breakage():
    """The arity checker itself must flag a dropped argument."""
    code = _stripped(MAIN)
    sig_arity = ALL_SIGS["deskew_wf"][0]
    args = _call_args(code, "deskew_wf")[0]
    assert len(args) == sig_arity
    broken = code.replace(args[-1] + ")", ")", 1)
    got = _call_args(broken, "deskew_wf")[0]
    assert len(got) != sig_arity
