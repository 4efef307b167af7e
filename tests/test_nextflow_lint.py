"""Syntax-level lint of the Groovy/Nextflow pipeline files.

The environment has no nextflow binary (round-2 verdict: the Groovy was
lint-unchecked), so this is a structural validator: a string/comment-aware
lexer checks bracket balance and unterminated literals, and structural checks
pin the DSL2 contract — every process has a script block, every include
resolves to a definition in the included file, every workflow the entrypoint
calls exists, and the preemption-retry config survives edits
(reference: nextflow/mantis-v2.nf:84-166, nextflow/nextflow.config:36-56).
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

NF_DIR = Path(__file__).parents[1] / "nextflow"
NF_FILES = sorted(NF_DIR.rglob("*.nf")) + [NF_DIR / "nextflow.config"]

OPEN, CLOSE = "([{", ")]}"
MATCH = {")": "(", "]": "[", "}": "{"}


def strip_groovy(text: str, path: str = "<str>") -> str:
    """Return ``text`` with comments and string literals blanked out.

    Handles // and /* */ comments, single/double/triple quotes, Groovy
    ${...} interpolation inside GStrings (whose contents are checked for
    balanced braces but otherwise opaque), and slashy /regex/ literals in
    regex position (after ( , = ~ : [ or 'replaceAll'-style calls).
    Raises AssertionError on unterminated literals.
    """
    out = []
    i, n = 0, len(text)
    last_code = ""  # last non-space code character, for slashy-regex position

    def scan_interpolation(j: int) -> int:
        """Consume ${...} starting at the '{'; return index past the '}'."""
        depth, k = 0, j
        while k < n:
            ch = text[k]
            if ch in "'\"":
                quote, k = ch, k + 1
                while k < n and text[k] != quote:
                    k += 2 if text[k] == "\\" else 1
                assert k < n, f"{path}: unterminated string in interpolation"
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    return k + 1
            k += 1
        raise AssertionError(f"{path}: unterminated ${{...}} interpolation")

    while i < n:
        ch = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if ch == "/" and nxt == "/":
            while i < n and text[i] != "\n":
                i += 1
        elif ch == "/" and nxt == "*":
            end = text.find("*/", i + 2)
            assert end != -1, f"{path}: unterminated /* comment"
            i = end + 2
        elif ch == "/" and last_code in "(,=~:[!&|" and last_code:
            i += 1
            while i < n and text[i] != "/":
                i += 2 if text[i] == "\\" else 1
            assert i < n, f"{path}: unterminated /slashy/ literal"
            i += 1
            last_code = "/"
        elif ch in "'\"":
            triple = text[i : i + 3] == ch * 3
            quote = ch * 3 if triple else ch
            i += len(quote)
            while i < n:
                if text[i] == "\\":
                    i += 2
                    continue
                if not triple and text[i] == "\n":
                    raise AssertionError(
                        f"{path}: unterminated single-line {quote} string"
                    )
                if ch == '"' and text[i] == "$" and i + 1 < n and text[i + 1] == "{":
                    i = scan_interpolation(i + 1)
                    continue
                if text[i : i + len(quote)] == quote:
                    i += len(quote)
                    break
                i += 1
            else:
                raise AssertionError(f"{path}: unterminated {quote} string")
            last_code = '"'
            out.append(" ")
        else:
            out.append(ch)
            if not ch.isspace():
                last_code = ch
            i += 1
    return "".join(out)


def check_balanced(code: str, path: str) -> None:
    stack = []
    for line_no, line in enumerate(code.splitlines(), 1):
        for ch in line:
            if ch in OPEN:
                stack.append((ch, line_no))
            elif ch in CLOSE:
                assert stack, f"{path}:{line_no}: unmatched {ch!r}"
                top, where = stack.pop()
                assert top == MATCH[ch], (
                    f"{path}:{line_no}: {ch!r} closes {top!r} from line {where}"
                )
    assert not stack, f"{path}: unclosed {stack[-1][0]!r} from line {stack[-1][1]}"


@pytest.mark.parametrize("path", NF_FILES, ids=lambda p: p.name)
def test_groovy_brackets_and_literals(path):
    check_balanced(strip_groovy(path.read_text(), str(path)), str(path))


def _definitions(text: str) -> set[str]:
    return set(
        re.findall(r"^\s*(?:def|process|workflow)\s+(\w+)", text, re.MULTILINE)
    )


@pytest.mark.parametrize(
    "path", sorted(NF_DIR.rglob("*.nf")), ids=lambda p: p.name
)
def test_includes_resolve(path):
    """Every `include { a; b } from './x'` names a definition in ./x.nf."""
    text = path.read_text()
    for names, target in re.findall(
        r"include\s*\{([^}]*)\}\s*from\s*'([^']+)'", text
    ):
        target_path = (path.parent / target).with_suffix(".nf")
        assert target_path.exists(), f"{path.name}: include target {target} missing"
        defined = _definitions(target_path.read_text())
        for name in names.replace(";", " ").split():
            name = name.strip()
            if name:
                assert name in defined, (
                    f"{path.name}: include {name!r} not defined in {target_path.name}"
                )


def test_processes_have_script_blocks():
    for path in sorted(NF_DIR.rglob("*.nf")):
        text = path.read_text()
        for proc in re.findall(r"^\s*process\s+(\w+)", text, re.MULTILINE):
            block = text[text.index(f"process {proc}") :]
            block = block[: block.find("\nprocess ") if "\nprocess " in block[1:] else len(block)]
            assert re.search(r"^\s*(script|exec|shell):", block, re.MULTILINE), (
                f"{path.name}: process {proc} has no script/exec block"
            )
            assert re.search(r"^\s*output:", block, re.MULTILINE), (
                f"{path.name}: process {proc} has no output block"
            )


def test_entrypoint_workflows_exist():
    """Every *_wf the main workflow calls is defined in an included module."""
    main = (NF_DIR / "biahub-tpu.nf").read_text()
    available = set()
    for module in sorted((NF_DIR / "modules").glob("*.nf")):
        available |= _definitions(module.read_text())
    called = set(re.findall(r"(\w+_wf)\s*\(", main))
    missing = called - available
    assert not missing, f"workflows called but not defined: {sorted(missing)}"


def test_config_preemption_retry_pinned():
    cfg = (NF_DIR / "nextflow.config").read_text()
    assert "130..145" in cfg and "'retry'" in cfg, "preemption retry window lost"
    assert re.search(r"maxRetries\s*=\s*[1-9]", cfg)
    assert "task.exitStatus" in cfg


def test_linter_catches_malformed_edits():
    """The lexer itself must flag the classic breakages."""
    good = (NF_DIR / "modules" / "deskew.nf").read_text()
    with pytest.raises(AssertionError):
        check_balanced(strip_groovy(good + "\n{", "x"), "x")
    with pytest.raises(AssertionError):
        strip_groovy(good.replace('"""', '"', 1), "x")  # unterminated script
    # Dropping a closing brace anywhere must be caught
    mangled = good.replace("}", "", 1)
    with pytest.raises(AssertionError):
        check_balanced(strip_groovy(mangled, "x"), "x")
