"""Deterministic synthetic fixtures (FIXTURES.md F1–F3): multi-turn
transcripts with planted near-duplicates, word dictionaries and query terms.
Seed-driven (default 42), no wall clock, no external data. Used by tests and
bench.py; the driver-provided /root/testdata parquet is never regenerated.
"""

from __future__ import annotations

import datetime as dt
import random
import string

__all__ = ["gen_transcript_rows", "gen_dictionary", "gen_queries", "TRANSCRIPT_COLUMNS"]

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "please", "run", "the", "tool", "and", "report",
    "status", "ok", "retry", "failed", "done", "open", "file", "close",
]
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "", "", "search", "bash", "python"]
_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _apply_edit(rng: random.Random, s: str, op: str) -> str:
    """One unit-cost edit of the given variant family applied to s."""
    letters = string.ascii_lowercase
    if not s:
        return rng.choice(letters)
    i = rng.randrange(len(s))
    if op == "sub":
        c = rng.choice(letters.replace(s[i], "a" if s[i] != "a" else "b"))
        return s[:i] + c + s[i + 1:]
    if op == "ins":
        return s[:i] + rng.choice(letters) + s[i:]
    if op == "del":
        return s[:i] + s[i + 1:]
    if op == "transpose":
        if len(s) < 2:
            return s + rng.choice(letters)
        i = rng.randrange(len(s) - 1)
        if s[i] == s[i + 1]:  # no-op transposition; substitute instead
            return _apply_edit(rng, s, "sub")
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    if op == "merge":
        if len(s) < 2:
            return s
        i = rng.randrange(len(s) - 1)
        return s[:i] + rng.choice(letters) + s[i + 2:]
    if op == "split":
        return s[:i] + rng.choice(letters) + rng.choice(letters) + s[i + 1:]
    raise ValueError(op)


_OPS_BY_ALGO = {
    "standard": ["sub", "ins", "del"],
    "transposition": ["sub", "ins", "del", "transpose"],
    "merge_and_split": ["sub", "ins", "del", "merge", "split"],
}


def gen_transcript_rows(
    n_base: int = 50,
    dup_fraction: float = 0.5,
    max_edits: int = 2,
    algorithm: str = "standard",
    seed: int = 42,
    max_dups: int = 2,
):
    """Rows (conv_id, turn_idx, role, text, tool, ts) for n_base base
    conversations plus planted near-duplicates (1..max_edits unit edits of
    the chosen variant applied inside single turns; 1..max_dups duplicates
    per duplicated conversation — the default 2 preserves the historical
    fixture stream). Returns (rows, planted) where planted maps dup
    conv_id -> (base conv_id, n_edits upper bound)."""
    rng = random.Random(seed)
    rows, planted = [], {}
    for b in range(n_base):
        conv_id = f"conv_{b:05d}"
        n_turns = rng.randint(3, 6)
        turns = []
        for t in range(n_turns):
            text = " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(3, 8)))
            turns.append(text)
            rows.append((
                conv_id, t, _ROLES[t % 3], text, rng.choice(_TOOLS),
                _EPOCH + dt.timedelta(seconds=b * 1000 + t),
            ))
        if rng.random() < dup_fraction:
            n_dups = rng.randint(1, max_dups)
            for d in range(n_dups):
                dup_id = f"conv_{b:05d}_dup{d}"
                n_edits = rng.randint(1, max_edits)
                dup_turns = list(turns)
                for _ in range(n_edits):
                    ti = rng.randrange(len(dup_turns))
                    op = rng.choice(_OPS_BY_ALGO[algorithm])
                    dup_turns[ti] = _apply_edit(rng, dup_turns[ti], op)
                planted[dup_id] = (conv_id, n_edits)
                for t, text in enumerate(dup_turns):
                    rows.append((
                        dup_id, t, _ROLES[t % 3], text, rng.choice(_TOOLS),
                        _EPOCH + dt.timedelta(seconds=b * 1000 + 500 + t),
                    ))
    return rows, planted


def gen_dictionary(n_terms: int = 400, seed: int = 7) -> list[str]:
    """Distinct sorted word-ish terms (FIXTURES.md F2)."""
    rng = random.Random(seed)
    terms = set(_VOCAB)
    while len(terms) < n_terms:
        w = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(2, 9)))
        terms.add(w)
    return sorted(terms)


def gen_queries(dictionary: list[str], n_queries: int = 60, seed: int = 11,
                algorithm: str = "standard", max_edits: int = 2) -> list[tuple[str, str]]:
    """(query_id, term): in-dictionary exact hits, planted near-misses, and
    random far terms (FIXTURES.md F3)."""
    rng = random.Random(seed)
    out = []
    for q in range(n_queries):
        kind = q % 3
        if kind == 0:
            term = rng.choice(dictionary)
        elif kind == 1:
            term = rng.choice(dictionary)
            for _ in range(rng.randint(1, max_edits)):
                term = _apply_edit(rng, term, rng.choice(_OPS_BY_ALGO[algorithm]))
        else:
            term = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(2, 10)))
        out.append((f"q_{q:04d}", term))
    return out
