"""F7: commandScore — fuzzy subsequence scorer for ranked search.

Same scoring model as ref apps/web/src/lib/command-score.ts:54-172
(continue=1, space-word-jump=0.9, gap-word-jump=0.8, char-jump=0.17,
transposition=0.1, skip/case/incomplete penalties), reimplemented
iteratively-memoized in Python. Used as a row-wise score column followed by
``orderBy(desc(score)).limit(k)`` = top-k ranking.
"""

from __future__ import annotations

import re

SCORE_CONTINUE_MATCH = 1.0
SCORE_SPACE_WORD_JUMP = 0.9
SCORE_NON_SPACE_WORD_JUMP = 0.8
SCORE_CHARACTER_JUMP = 0.17
SCORE_TRANSPOSITION = 0.1
PENALTY_SKIPPED = 0.999
PENALTY_CASE_MISMATCH = 0.9999
PENALTY_NOT_COMPLETE = 0.99

_GAP_RE = re.compile(r'[\\/_+.#"@\[\({&]')
_SPACE_RE = re.compile(r"[\s-]")


def _format(s: str) -> str:
    return _SPACE_RE.sub(" ", s.lower())


def command_score(value: str, query: str) -> float:
    """Score how well ``query`` fuzzy-matches ``value`` (1.0 = perfect)."""
    lower_value = _format(value)
    lower_query = _format(query)
    memo: dict[tuple[int, int], float] = {}

    def inner(si: int, qi: int) -> float:
        if qi == len(query):
            return SCORE_CONTINUE_MATCH if si == len(value) else PENALTY_NOT_COMPLETE
        key = (si, qi)
        if key in memo:
            return memo[key]
        qchar = lower_query[qi]
        high = 0.0
        idx = lower_value.find(qchar, si)
        while idx >= 0:
            score = inner(idx + 1, qi + 1)
            if score > high:
                if idx == si:
                    score *= SCORE_CONTINUE_MATCH
                elif idx > 0 and _GAP_RE.match(value[idx - 1]):
                    score *= SCORE_NON_SPACE_WORD_JUMP
                    breaks = _GAP_RE.findall(value[si : idx - 1])
                    if breaks and si > 0:
                        score *= PENALTY_SKIPPED ** len(breaks)
                elif idx > 0 and _SPACE_RE.match(value[idx - 1]):
                    score *= SCORE_SPACE_WORD_JUMP
                    breaks = _SPACE_RE.findall(value[si : idx - 1])
                    if breaks and si > 0:
                        score *= PENALTY_SKIPPED ** len(breaks)
                else:
                    score *= SCORE_CHARACTER_JUMP
                    if si > 0:
                        score *= PENALTY_SKIPPED ** (idx - si)
                if value[idx] != query[qi]:
                    score *= PENALTY_CASE_MISMATCH

            nxt = lower_query[qi + 1] if qi + 1 < len(query) else ""
            prev = lower_value[idx - 1] if idx > 0 else ""
            if (score < SCORE_TRANSPOSITION and prev == nxt) or (
                nxt == qchar and nxt != "" and prev != qchar
            ):
                transposed = inner(idx + 1, qi + 2)
                if transposed * SCORE_TRANSPOSITION > score:
                    score = transposed * SCORE_TRANSPOSITION
            if score > high:
                high = score
            idx = lower_value.find(qchar, idx + 1)
        memo[key] = high
        return high

    return inner(0, 0)
