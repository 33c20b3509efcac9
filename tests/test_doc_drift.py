"""Docs must quote the committed benchmark artifacts, not memories of them.

Rounds 2-4 each shipped README/PARITY/PERFORMANCE prose contradicting
benchmarks/*.json (round 4's worst: a 216x streaming RTF the builder had
already disproven). This guard makes the drift mechanical to catch:

Every load-bearing performance number quoted in README.md, PARITY.md and
docs/PERFORMANCE.md carries an HTML-comment marker immediately after it:

    157.8k clips/s<!--#bench extra_metrics.json "frontend+EfficientNetB0"
    value tol=0.02-->

    <!--#bench FILE ["METRIC SUBSTRING"] DOTTED.PATH [tol=REL]-->

FILE is under benchmarks/. If the quoted substring is given, the file's
top-level "metrics" list is searched for the dict whose "metric" field
contains it; DOTTED.PATH then indexes from that dict (or from the file
root when no selector is given). The number checked is the last numeric
token before the marker on the same (logical) line, with k/M/%/x
suffixes normalized. Default tolerance is 2% relative (the docs quote a
specific committed run; regenerating artifacts means re-sweeping the
quotes, which is the point).

Historical / narrative numbers that intentionally do NOT track the
current artifact are tagged <!--#hist--> instead. Every line in the
guarded docs that mentions clips/s or a real-time factor must carry one
of the two markers, so a future quote cannot be added unconsciously.
"""

from __future__ import annotations

import json
import re
import shlex
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
GUARDED_DOCS = ["README.md", "PARITY.md", "docs/PERFORMANCE.md"]

_MARKER = re.compile(r"<!--#bench\s+(.*?)-->", re.S)
_HIST = "<!--#hist-->"
# last numeric token before the marker: 157.8k / 46.1 / 52.6% / 6596x...
_NUM = re.compile(
    r"((?<![\d.\w])-?\d+(?:\.\d+)?)\s*([kM%]|[x×](?![\w-]))?(?=[^\d]*$)"
)
_SUFFIX = {None: 1.0, "": 1.0, "k": 1e3, "M": 1e6, "%": 1.0,
           "x": 1.0, "×": 1.0}


def _resolve(file: str, selector: str | None, path: str):
    data = json.loads((REPO / "benchmarks" / file).read_text())
    node = data
    if selector is not None:
        for m in data["metrics"]:
            if selector in m.get("metric", ""):
                node = m
                break
        else:
            raise KeyError(f"no metric containing {selector!r} in {file}")
    for part in path.split("."):
        if isinstance(node, list):
            node = node[int(part)]
        else:
            node = node[part]
    return float(node)


def _parse_marker(body: str):
    toks = shlex.split(body)
    tol = 0.02
    if toks and toks[-1].startswith("tol="):
        tol = float(toks.pop()[4:])
    file = toks.pop(0)
    path = toks.pop()
    selector = toks.pop(0) if toks else None
    assert not toks, f"unparsed marker tokens: {toks}"
    return file, selector, path, tol


def _iter_markers(text: str):
    """Yield (quoted_number, file, selector, path, tol, context)."""
    for m in _MARKER.finditer(text):
        before = text[: m.start()]
        # the quoted number lives on the marker's logical line; allow the
        # marker to sit on its own line right after the number's line
        tail = before[-200:].rstrip()
        tail_line = tail.rsplit("\n", 1)[-1]
        num = _NUM.search(tail_line) or _NUM.search(tail[-120:])
        assert num, f"no number found before marker: ...{tail[-80:]!r}"
        value = float(num.group(1)) * _SUFFIX[num.group(2)]
        is_pct = num.group(2) == "%"
        yield value, is_pct, *_parse_marker(m.group(1)), tail_line.strip()


@pytest.mark.parametrize("doc", GUARDED_DOCS)
def test_doc_numbers_match_artifacts(doc):
    text = (REPO / doc).read_text()
    checked = 0
    failures = []
    for value, is_pct, file, selector, path, tol, ctx in _iter_markers(text):
        want = _resolve(file, selector, path)
        checked += 1
        if is_pct and abs(value / 100 - want) <= abs(value - want):
            # artifacts store some percentages as fractions (mfu 0.127)
            # and others as percents (pct_of_train_step_bound 52.6);
            # accept whichever scale the artifact uses
            value = value / 100
        if abs(value - want) > tol * max(abs(want), 1e-12):
            failures.append(
                f"{doc}: quotes {value:g} but {file}"
                f"{'[' + selector + ']' if selector else ''}.{path} = "
                f"{want:g} (tol {tol:.0%})  | {ctx[:90]}"
            )
    assert not failures, "\n".join(failures)
    if doc != "README.md":
        assert checked >= 3, f"{doc}: expected >=3 tagged numbers, {checked}"


@pytest.mark.parametrize("doc", GUARDED_DOCS)
def test_throughput_lines_are_tagged(doc):
    """Any line quoting clips/s or a real-time factor must be tagged
    #bench (tracked) or #hist (consciously historical)."""
    text = (REPO / doc).read_text()
    # a marker may sit on the line after its number: treat "line + next
    # line" as the tag scope
    lines = text.split("\n")
    untagged = []
    pat = re.compile(r"\d[\d.,]*\s*k?\s*(clips/s|clips/sec)|"
                     r"\d[\d.,]*\s*[x×]\s*(real.?time)|"
                     r"real.?time factor of \d", re.I)
    for i, line in enumerate(lines):
        if not pat.search(line):
            continue
        scope = "\n".join(lines[i : i + 3])
        if "<!--#bench" in scope or _HIST in scope:
            continue
        untagged.append(f"{doc}:{i + 1}: {line.strip()[:100]}")
    assert not untagged, (
        "untagged throughput/RTF quotes (add <!--#bench ...--> or "
        "<!--#hist-->):\n" + "\n".join(untagged)
    )


def test_marker_parser_roundtrip():
    """The marker grammar itself (so a bad edit fails loudly here, not as
    a silent non-check)."""
    text = (
        "headline 157.8k clips/s<!--#bench extra_metrics.json "
        '"frontend+EfficientNetB0" value tol=0.05--> and 46.1x '
        "real-time<!--#bench extra_metrics.json \"streaming KWS\" "
        "real_time_factor-->"
    )
    got = list(_iter_markers(text))
    assert got[0][0] == 157800.0 and got[0][2] == "extra_metrics.json"
    assert got[0][3] == "frontend+EfficientNetB0" and got[0][5] == 0.05
    assert got[1][0] == 46.1 and got[1][4] == "real_time_factor"
    assert got[1][5] == 0.02
    rng = list(_iter_markers("ran 230-256 s<!--#bench f.json a.b-->"))
    assert rng[0][0] == 256.0, "range dash must not read as a minus sign"
