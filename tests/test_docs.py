"""Docs-as-tests: execute every ```python block in the user docs.

The analog of the reference's rundoc harness (reference Makefile:203-221),
which runs each docs example so published snippets can't rot. Blocks within
one file share a namespace and run in order (like rundoc); each file runs in
a temp cwd so examples may write checkpoint files.

Runs on the CPU mesh like the rest of the suite; sizes in the docs are
real (100k-row) examples, so this is the slow integration tier.
"""

import pathlib
import re

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
DOC_FILES = sorted(
    p.relative_to(REPO).as_posix()
    for p in [
        REPO / "README.md",
        *(REPO / "docs").glob("*.md"),
        *(REPO / "pyvq" / "docs").glob("*.md"),
    ]
    if re.search(r"```python\n", p.read_text())
)


def extract_python_blocks(text: str):
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


@pytest.mark.parametrize(
    "cfg,docs",
    [("mkdocs.yml", "docs"), ("pyvq/mkdocs.yml", "pyvq/docs")],
)
def test_mkdocs_nav_matches_docs_dir(cfg, docs):
    """Every nav entry in each mkdocs.yml exists, and every docs page is
    in its nav — the local proxy for the CI `mkdocs build --strict` job
    (mkdocs itself is not installed in this environment). Two sites, the
    reference's structure: the framework site + the pyvq shim site."""
    text = (REPO / cfg).read_text()
    nav = re.findall(r"^\s+- [^:]+:\s+(\S+\.md)\s*$", text, re.MULTILINE)
    assert nav, f"{cfg} has no nav entries"
    missing = [p for p in nav if not (REPO / docs / p).is_file()]
    assert not missing, f"nav entries without files: {missing}"
    orphans = sorted(
        p.name for p in (REPO / docs).glob("*.md") if p.name not in nav
    )
    assert not orphans, f"docs pages missing from nav: {orphans}"


@pytest.mark.parametrize("relpath", DOC_FILES)
def test_doc_code_blocks_execute(relpath, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    blocks = extract_python_blocks((REPO / relpath).read_text())
    assert blocks, f"{relpath} listed but has no python blocks"
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{relpath}[block {i}]", "exec"), ns)
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"{relpath} block {i} failed: {e}\n---\n{block}")
