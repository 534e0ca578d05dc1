"""The analyzer: code-aware tokenization, frozen for rank-identity.

The reference's document analyzer (services/indexer/utils/utils.py:129-133)
is: word_tokenize -> lowercase -> drop NLTK-English stopwords -> keep only
``str.isalnum()`` tokens.  Its *query* analyzer is different
(services/query-engine/app/Http/Controllers/QuerySearchController.php:248-249):
replace '+' with ' ', split on spaces, lowercase — no stopword or alnum
filtering.  Both are mirrored here, with the document analyzer extended for
source code (the corpus mandated by BASELINE.json input_hint): snake_case,
camelCase and dotted-path identifiers are sub-split, per SURVEY.md §7.3.

FROZEN SPEC (any change invalidates every stored index and golden file):

  doc mode:
    1. split content on runs of characters outside [A-Za-z0-9_]
    2. split each piece on '_' (snake_case)
    3. split camelCase boundaries: between [a-z0-9]->[A-Z] and between
       [A-Z]->[A-Z][a-z]  (``HTTPServer2`` -> ``HTTP``, ``Server2``)
    4. lowercase
    5. drop tokens in the vendored stopword list (stopwords.py)
    6. keep only non-empty pure-alnum tokens  (guaranteed by construction
       after steps 1-4, kept as an explicit isalnum() check for fidelity
       with utils.py:132)
    position = index in the post-filter token stream, 0-based.
    doc_len  = number of post-filter tokens.

  query mode:
    q.replace('+', ' ').lower().split()   # whitespace split, nothing else

The same pure-Python function is executed by both the Spark pandas UDFs
(Arrow-batched) and the single-node oracle, so tf/df are identical by
construction.
"""

from __future__ import annotations

import re
from collections import Counter

from .stopwords import STOPWORDS

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


# Memo of raw word -> processed token tuple.  tokenize_doc is a pure
# function of each raw word, and real corpora are Zipf-heavy, so the hit
# rate is high (measured 1.7x on the synthetic corpus).  Bounded: cleared
# wholesale when it grows past the cap (per Python worker process).
_RAW_MEMO: dict[str, tuple[str, ...]] = {}
_RAW_MEMO_CAP = 200_000


def _split_raw(raw: str) -> tuple[str, ...]:
    toks: list[str] = []
    for piece in raw.split("_"):
        if not piece:
            continue
        # fast path: no uppercase -> the camel regex cannot split
        subs = (piece,) if piece == piece.lower() else _CAMEL_RE.split(piece)
        for sub in subs:
            tok = sub.lower()
            if tok and tok not in STOPWORDS and tok.isalnum():
                toks.append(tok)
    return tuple(toks)


def tokenize_doc(content: str) -> list[str]:
    """Document-mode analyzer. Pure function, frozen (see module doc)."""
    if not content:
        return []
    out: list[str] = []
    memo = _RAW_MEMO
    for raw in _WORD_RE.findall(content):
        cached = memo.get(raw)
        if cached is None:
            if len(memo) >= _RAW_MEMO_CAP:
                memo.clear()
            cached = _split_raw(raw)
            memo[raw] = cached
        out.extend(cached)
    return out


def tokenize_query(q: str) -> list[str]:
    """Query-mode analyzer (QuerySearchController.php:248-249 semantics):
    '+' -> ' ', lowercase, whitespace split — FROZEN for ASCII words
    (golden hashes depend on it).

    Deliberate deviation for non-ASCII words: the reference's NLTK
    indexer keeps a unicode word whole, so its raw query lookup matches;
    OUR doc analyzer sub-splits on [A-Za-z0-9_] runs, so a raw unicode
    query word ('héllo') could never match its own indexed form
    ('h', 'llo').  Such words are therefore re-tokenized with the doc
    analyzer — pure-ASCII queries are byte-for-byte unchanged."""
    out: list[str] = []
    for w in q.replace("+", " ").lower().split():
        if w.isascii():
            out.append(w)
        else:
            out.extend(tokenize_doc(w))
    return out


def term_freqs(content: str) -> dict[str, int]:
    """term -> tf for one document."""
    return dict(Counter(tokenize_doc(content)))


def term_freqs_positions(content: str) -> dict[str, tuple[int, list[int]]]:
    """term -> (tf, positions) for one document. Positions are indices in
    the post-filter token stream (SURVEY.md §7.3 'positions arrays')."""
    toks = tokenize_doc(content)
    acc: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        acc.setdefault(t, []).append(i)
    return {t: (len(p), p) for t, p in acc.items()}
