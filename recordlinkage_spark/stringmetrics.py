"""Pure-Python/numpy string-similarity kernels.

The reference delegates to jellyfish/sklearn (recordlinkage/algorithms/
string.py). Neither is installed here, so these are independent
implementations of the same *published* algorithms, pinned to the
reference's normalizations:

- levenshtein / damerau:  1 - dist / max(len)        (string.py:49-82)
- jaro-winkler:           winkler boost only if jaro > 0.7, prefix <= 4
                          (jellyfish semantics, used by string.py:32-46)
- qgram:   sum(min(u,v)) / max(sum u, sum v) over char_wb 2-gram counts
           (string.py:85-118; sklearn char_wb analyzer semantics)
- cosine:  <u,v> / (|u||v|) over the same count vectors (string.py:121-152)
- smith_waterman: affine-ish gap DP, norm in {min,max,mean}
                  (string.py:155-370)
- lcs: iterated longest-common-substring accumulation, both orderings
       averaged, norm in {overlap,jaccard,dice} (string.py:373-559)

All kernels are batch functions ``(pd.Series, pd.Series) -> pd.Series`` so
they slot directly into Arrow-batched pandas UDFs (the engine's only Python
hot path). NaN in → NaN out (filled later per the reference's
missing_value contract, compare.py:154-160).
"""

from __future__ import annotations

import unicodedata
from collections import Counter

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# scalar kernels
# ---------------------------------------------------------------------------

def jaro(s1: str, s2: str) -> float:
    """Standard Jaro similarity (Jaro 1989)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(i + match_window + 1, len2)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: matched chars out of order / 2
    t = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    m = float(matches)
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler with jellyfish semantics: boost only when jaro > 0.7."""
    j = jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for c1, c2 in zip(s1, s2):
            if c1 != c2 or prefix == 4:
                break
            prefix += 1
        j += prefix_weight * prefix * (1.0 - j)
    return j


def levenshtein_distance(s1: str, s2: str) -> int:
    """Classic Wagner–Fischer, numpy row-vectorized."""
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    a1 = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    a2 = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    ar = np.arange(len(a2) + 1, dtype=np.int64)
    prev = ar.copy()
    for i, c in enumerate(a1):
        cur = np.empty_like(prev)
        cur[0] = i + 1
        # substitution / insertion, fully vectorized
        np.minimum(prev[:-1] + (a2 != c), prev[1:] + 1, out=cur[1:])
        # deletion cur[j] = min(cur[j], cur[j-1]+1) is a min-plus prefix with
        # slope 1: subtract the index, running-min, add it back.
        t = cur - ar
        np.minimum.accumulate(t, out=t)
        cur = t + ar
        prev = cur
    return int(prev[-1])


def damerau_levenshtein_distance(s1: str, s2: str) -> int:
    """Unrestricted Damerau-Levenshtein (with the 'da' alphabet table),
    matching jellyfish's choice of the full DL distance."""
    len1, len2 = len(s1), len(s2)
    if s1 == s2:
        return 0
    maxdist = len1 + len2
    da: dict[str, int] = {}
    d = np.zeros((len1 + 2, len2 + 2), dtype=np.int64)
    d[0, :] = maxdist
    d[:, 0] = maxdist
    d[1, 1:] = np.arange(len2 + 1)
    d[1:, 1] = np.arange(len1 + 1)
    for i in range(1, len1 + 1):
        db = 0
        for j in range(1, len2 + 1):
            k = da.get(s2[j - 1], 0)
            l_ = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1, j + 1] = min(
                d[i, j] + cost,          # substitution
                d[i + 1, j] + 1,         # insertion
                d[i, j + 1] + 1,         # deletion
                d[k, l_] + (i - k - 1) + 1 + (j - l_ - 1),  # transposition
            )
        da[s1[i - 1]] = i
    return int(d[len1 + 1, len2 + 1])


def _strip_accents_unicode(s: str) -> str:
    """sklearn-compatible unicode accent stripping (NFKD + drop combining).

    ASCII fast path: NFKD is the identity and no ASCII char is combining,
    so the normalize + per-char scan can be skipped entirely (most webtext
    fields are ASCII — measured ~25% of the whole qgram batch kernel)."""
    if s.isascii():
        return s
    norm = unicodedata.normalize("NFKD", s)
    return "".join(c for c in norm if not unicodedata.combining(c))


def char_wb_ngrams(s: str, n_min: int = 2, n_max: int = 2) -> Counter:
    """sklearn CountVectorizer(analyzer='char_wb') n-gram counts.

    Lowercases, strips accents (unicode), collapses whitespace, pads each
    whitespace-token with one space per side, emits all n-grams per padded
    token; a token shorter than n is counted once as-is.
    """
    s = _strip_accents_unicode(s.lower())
    counts: Counter = Counter()
    for w in s.split():
        w = f" {w} "
        w_len = len(w)
        for n in range(n_min, n_max + 1):
            offset = 0
            counts[w[offset : offset + n]] += 1
            while offset + n < w_len:
                offset += 1
                counts[w[offset : offset + n]] += 1
            if offset == 0:  # short token counted once
                break
    return counts


def qgram_sim(s1: str, s2: str, ngram=(2, 2)) -> float:
    u = char_wb_ngrams(s1, *ngram)
    v = char_wb_ngrams(s2, *ngram)
    total = max(sum(u.values()), sum(v.values()))
    if total == 0:
        return np.nan
    match = sum(min(c, v[g]) for g, c in u.items())
    return match / total


def cosine_sim(s1: str, s2: str, ngram=(2, 2)) -> float:
    u = char_wb_ngrams(s1, *ngram)
    v = char_wb_ngrams(s2, *ngram)
    a = np.sqrt(sum(c * c for c in u.values()))
    b = np.sqrt(sum(c * c for c in v.values()))
    if a == 0 or b == 0:
        return np.nan
    ab = sum(c * v[g] for g, c in u.items())
    return ab / (a * b)


def smith_waterman_sim(
    s1: str,
    s2: str,
    match: float = 5.0,
    mismatch: float = -5.0,
    gap_start: float = -5.0,
    gap_continue: float = -1.0,
    norm: str = "mean",
) -> float:
    """Smith-Waterman local alignment with trace-aware gap costs and the
    reference's min/max/mean normalizations (string.py:155-357)."""
    if len(s1) == 0 or len(s2) == 0:
        return 0.0
    n1, n2 = len(s1), len(s2)
    m = np.zeros((n1 + 1, n2 + 1))
    # trace bits: 1=D, 2=H, 4=V
    tr = np.zeros((n1 + 1, n2 + 1), dtype=np.uint8)
    highest = 0.0
    for x in range(1, n1 + 1):
        c1 = s1[x - 1]
        for y in range(1, n2 + 1):
            diag = m[x - 1, y - 1] + (match if c1 == s2[y - 1] else mismatch)
            gh = m[x - 1, y] + (gap_continue if tr[x - 1, y] & 2 else gap_start)
            gv = m[x, y - 1] + (gap_continue if tr[x, y - 1] & 4 else gap_start)
            score = max(diag, gh, gv)
            if score <= 0:
                score = 0.0
            else:
                bits = 0
                if score == diag:
                    bits |= 1
                if score == gh:
                    bits |= 2
                if score == gv:
                    bits |= 4
                tr[x, y] = bits
            if score > highest:
                highest = score
            m[x, y] = score
    if norm == "min":
        return highest / (min(n1, n2) * match)
    if norm == "max":
        return highest / (max(n1, n2) * match)
    return 2.0 * highest / ((n1 + n2) * match)


def _lcs_once(s1: str, s2: str):
    """One longest-common-substring pass; returns (s1', s2', length)
    with the found substring excised (string.py:405-464)."""
    n1, n2 = len(s1), len(s2)
    longest, x_end, y_end = 0, 0, 0
    prev = [0] * (n2 + 1)
    for x in range(1, n1 + 1):
        cur = [0] * (n2 + 1)
        c1 = s1[x - 1]
        for y in range(1, n2 + 1):
            if c1 == s2[y - 1]:
                v = prev[y - 1] + 1
                cur[y] = v
                if v > longest:
                    longest, x_end, y_end = v, x, y
        prev = cur
    new1 = s1[: x_end - longest] + s1[x_end:]
    new2 = s2[: y_end - longest] + s2[y_end:]
    return new1, new2, longest


def lcs_sim(s1: str, s2: str, norm: str = "dice", min_len: int = 2) -> float:
    """Iterated LCS similarity, both orderings averaged (string.py:373-559)."""
    def accumulate(a: str, b: str) -> int:
        acc = 0
        while min(len(a), len(b)) >= min_len:
            a2, b2, ln = _lcs_once(a, b)
            if ln < min_len:
                break
            acc += ln
            a, b = a2, b2
        return acc

    len1, len2 = len(s1), len(s2)

    def normalize(v: float) -> float:
        if len1 == 0 or len2 == 0:
            return 0.0
        if norm == "overlap":
            return v / min(len1, len2)
        if norm == "jaccard":
            return v / (len1 + len2 - abs(v))
        return v * 2.0 / (len1 + len2)

    return (normalize(accumulate(s1, s2)) + normalize(accumulate(s2, s1))) / 2.0


# ---------------------------------------------------------------------------
# phonetic encodings (reference: recordlinkage/preprocessing/encoding.py,
# delegating to jellyfish; these are independent implementations of the
# published algorithms)
# ---------------------------------------------------------------------------

_SOUNDEX_MAP = {
    **dict.fromkeys("BFPV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}


def soundex(s: str) -> str:
    s = "".join(c for c in s.upper() if c.isalpha())
    if not s:
        return ""
    out = [s[0]]
    prev = _SOUNDEX_MAP.get(s[0], "")
    for c in s[1:]:
        code = _SOUNDEX_MAP.get(c, "")
        if code and code != prev:
            out.append(code)
            if len(out) == 4:
                break
        if c not in "HW":  # H/W do not reset the previous code
            prev = code
    return "".join(out).ljust(4, "0")


_NYSIIS_VOWELS = set("AEIOU")


def nysiis(s: str) -> str:
    """NYSIIS phonetic code (standard published algorithm)."""
    s = "".join(c for c in s.upper() if c.isalpha())
    if not s:
        return ""
    # initial transformations
    for pre, rep in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"), ("PH", "FF"),
                     ("PF", "FF"), ("SCH", "SSS")):
        if s.startswith(pre):
            s = rep + s[len(pre):]
            break
    for suf, rep in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                     ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if s.endswith(suf):
            s = s[: -len(suf)] + rep
            break
    key = [s[0]]
    i = 1
    n = len(s)
    while i < n:
        c = s[i]
        if s[i : i + 2] == "EV":
            c2, step = "AF", 2
        elif c in _NYSIIS_VOWELS:
            c2, step = "A", 1
        elif c == "Q":
            c2, step = "G", 1
        elif c == "Z":
            c2, step = "S", 1
        elif c == "M":
            c2, step = "N", 1
        elif s[i : i + 2] == "KN":
            c2, step = "N", 2
        elif c == "K":
            c2, step = "C", 1
        elif s[i : i + 3] == "SCH":
            c2, step = "SSS", 3
        elif s[i : i + 2] == "PH":
            c2, step = "FF", 2
        elif c == "H" and (
            s[i - 1] not in _NYSIIS_VOWELS
            or (i + 1 < n and s[i + 1] not in _NYSIIS_VOWELS)
        ):
            c2, step = s[i - 1], 1
        elif c == "W" and s[i - 1] in _NYSIIS_VOWELS:
            c2, step = s[i - 1], 1
        else:
            c2, step = c, 1
        if c2 and c2[0] != key[-1]:
            key.append(c2[0])
        i += step
    out = "".join(key)
    if out.endswith("S") and len(out) > 1:
        out = out[:-1]
    if out.endswith("AY"):
        out = out[:-2] + "Y"
    if out.endswith("A") and len(out) > 1:
        out = out[:-1]
    return out


def match_rating_codex(s: str) -> str:
    """Match Rating Approach codex (published algorithm)."""
    s = "".join(c for c in s.upper() if c.isalpha())
    if not s:
        return ""
    out = [s[0]]
    for c in s[1:]:
        if c in "AEIOU":
            continue
        out.append(c)
    # collapse doubled consonants
    dedup = [out[0]]
    for c in out[1:]:
        if c != dedup[-1]:
            dedup.append(c)
    code = "".join(dedup)
    if len(code) > 6:
        code = code[:3] + code[-3:]
    return code


def metaphone(s: str) -> str:
    """Original Metaphone (Philips 1990), standard published rules."""
    s = "".join(c for c in s.upper() if c.isalpha())
    if not s:
        return ""
    # initial-letter exceptions
    for pre, rep in (("AE", "E"), ("GN", "N"), ("KN", "N"), ("PN", "N"),
                     ("WR", "R"), ("X", "S"), ("WH", "W")):
        if s.startswith(pre):
            s = rep + s[len(pre):]
            break
    out = []
    n = len(s)
    i = 0
    vowels = "AEIOU"

    def at(k):
        return s[k] if 0 <= k < n else ""

    while i < n:
        c = s[i]
        if i > 0 and c == at(i - 1) and c != "C":
            i += 1
            continue
        if c in vowels:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and at(i - 1) == "M"):
                out.append("B")
        elif c == "C":
            if at(i + 1) == "I" and at(i + 2) == "A":
                out.append("X")
            elif at(i + 1) == "H":
                if at(i - 1) == "S":
                    out.append("K")
                else:
                    out.append("X")
                i += 1
            elif at(i + 1) in "IEY":
                if at(i - 1) == "S":
                    pass
                else:
                    out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if at(i + 1) == "G" and at(i + 2) in "IEY":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            if at(i + 1) == "H":
                if i + 1 == n - 1 or at(i + 2) not in vowels:
                    pass  # silent GH
                else:
                    out.append("K")
                    i += 1
            elif at(i + 1) == "N":
                pass  # silent before N
            elif at(i + 1) in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if at(i - 1) in vowels and at(i + 1) not in vowels:
                pass
            elif at(i - 1) in "CSPTG":
                pass
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if at(i - 1) != "C":
                out.append("K")
        elif c == "P":
            if at(i + 1) == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if at(i + 1) == "H":
                out.append("X")
                i += 1
            elif at(i + 1) == "I" and at(i + 2) in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if at(i + 1) == "H":
                out.append("0")
                i += 1
            elif at(i + 1) == "I" and at(i + 2) in "OA":
                out.append("X")
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if at(i + 1) in vowels:
                out.append("W")
        elif c == "X":
            out.append("KS")
        elif c == "Y":
            if at(i + 1) in vowels:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# batch (pandas) wrappers — the shapes pandas UDFs consume
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# batch-vectorized jaro / jaro-winkler / damerau (r3)
#
# The scalar kernels above stay as the differential-test oracles; the
# batch functions below vectorize the same DPs ACROSS the Arrow batch
# dimension, the way levenshtein_distance vectorizes across DP rows:
# every step is one numpy op over a (batch, chars) matrix instead of a
# per-character Python loop per pair. Pairs with strings longer than the
# vectorization cutoffs fall back to the scalar kernels (memory bound on
# the padded matrices), so behavior is identical at every length.
# ---------------------------------------------------------------------------

_VEC_MAX_LEN_JARO = 512  # per-step temporaries are (batch, L) bools
_VEC_MAX_LEN_DL = 64     # DP cube is (chunk, L1+2, L2+2) int32
_DL_CHUNK = 1024


def _valid_pairs(s1: pd.Series, s2: pd.Series):
    """(out, idx, list1, list2): NaN-prefilled output plus the positions
    and str-coerced values of the non-null pairs (null pairs stay NaN —
    the contract every *_batch kernel shares)."""
    out = np.full(len(s1), np.nan)
    a1 = s1.to_numpy(dtype=object)
    a2 = s2.to_numpy(dtype=object)

    def ok(v):
        return not (v is None or (isinstance(v, float) and np.isnan(v)))

    idx = np.fromiter(
        (i for i in range(len(out)) if ok(a1[i]) and ok(a2[i])),
        dtype=np.int64,
    )
    return out, idx, [str(a1[i]) for i in idx], [str(a2[i]) for i in idx]


def _encode_pad(strs: list[str]):
    """Padded (n, Lmax) uint32 codepoint matrix + lengths, built from ONE
    utf-32 encode of the concatenated batch (no per-string frombuffer)."""
    flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=len(strs))
    L = max(int(lens.max()), 1) if len(lens) else 1
    M = np.zeros((len(strs), L), dtype=np.uint32)
    M[np.arange(L)[None, :] < lens[:, None]] = flat
    return M, lens


def _jaro_np(strs1: list[str], strs2: list[str], winkler: bool) -> np.ndarray:
    """Vectorized Jaro(-Winkler) for a batch of string pairs.

    The greedy window-match loop runs over s1 character POSITIONS (short),
    with each step a vectorized first-unmatched-equal-in-window argmax
    across the whole batch; transpositions come from one flat segmented
    mismatch count over the matched characters (row-major flatten of the
    flag masks preserves per-pair order)."""
    A, len1 = _encode_pad(strs1)
    Bm, len2 = _encode_pad(strs2)
    B, (L1, L2) = len(strs1), (A.shape[1], Bm.shape[1])
    w = np.maximum(np.maximum(len1, len2) // 2 - 1, 0)
    flags1 = np.zeros((B, L1), dtype=bool)
    flags2 = np.zeros((B, L2), dtype=bool)
    j_idx = np.arange(L2)
    for i in range(L1):
        active = i < len1
        if not active.any():
            break
        lo = np.maximum(0, i - w)
        hi = np.minimum(i + w + 1, len2)
        # pad chars can never false-match: j < len2 bounds the window and
        # i < len1 bounds the active rows
        cand = (
            (Bm == A[:, i][:, None])
            & ~flags2
            & (j_idx[None, :] >= lo[:, None])
            & (j_idx[None, :] < hi[:, None])
            & active[:, None]
        )
        hit = cand.any(axis=1)
        js = cand.argmax(axis=1)
        rows = np.nonzero(hit)[0]
        flags1[rows, i] = True
        flags2[rows, js[rows]] = True
    matches = flags1.sum(axis=1)
    neq = A[flags1] != Bm[flags2]
    cs = np.concatenate([[0], np.cumsum(neq)])
    ends = np.cumsum(matches)
    t = (cs[ends] - cs[ends - matches]) // 2
    m = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = (m / len1 + m / len2 + (m - t) / np.maximum(m, 1)) / 3.0
    sim = np.where(matches == 0, 0.0, sim)
    # scalar early-out parity: s1 == s2 -> 1.0 (the formula already gives
    # 1.0 for equal non-empty strings; this covers the both-empty case too)
    Lc = min(L1, L2)
    eq = (len1 == len2) & (A[:, :Lc] == Bm[:, :Lc]).all(axis=1)
    sim = np.where(eq, 1.0, sim)
    if not winkler:
        return sim
    P = min(4, L1, L2)
    if P:
        pe = (A[:, :P] == Bm[:, :P]) & (
            np.arange(P)[None, :] < np.minimum(len1, len2)[:, None]
        )
        prefix = np.cumprod(pe, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(B, dtype=np.int64)
    return np.where(sim > 0.7, sim + 0.1 * prefix * (1.0 - sim), sim)


def _damerau_np(strs1: list[str], strs2: list[str]) -> np.ndarray:
    """Vectorized unrestricted Damerau-Levenshtein distance for a batch.

    The full (i, j) DP runs as scalar loops over character positions with
    every cell update a numpy op across the batch; the per-pair 'da'
    alphabet table becomes a (batch, alphabet) matrix via a shared
    codebook (np.unique over the batch's characters). Cells beyond a
    pair's own lengths compute garbage that its valid region never reads
    (the answer cell is (len1+1, len2+1); 'da'/'db' pollution from pad
    chars only feeds other garbage cells)."""
    A, len1 = _encode_pad(strs1)
    Bm, len2 = _encode_pad(strs2)
    B, (L1, L2) = len(strs1), (A.shape[1], Bm.shape[1])
    uniq = np.unique(np.concatenate([A[A != 0], Bm[Bm != 0]]))
    Ac = (np.searchsorted(uniq, A) + 1).astype(np.int32)
    Ac[A == 0] = 0
    Bc = (np.searchsorted(uniq, Bm) + 1).astype(np.int32)
    Bc[Bm == 0] = 0
    V = len(uniq) + 1
    INF = L1 + L2 + 1
    D = np.zeros((B, L1 + 2, L2 + 2), dtype=np.int32)
    D[:, 0, :] = INF
    D[:, :, 0] = INF
    D[:, 1, 1:] = np.arange(L2 + 1)
    D[:, 1:, 1] = np.arange(L1 + 1)
    da = np.zeros((B, V), dtype=np.int32)
    ridx = np.arange(B)
    for i in range(1, L1 + 1):
        c1 = Ac[:, i - 1]
        db = np.zeros(B, dtype=np.int32)
        for j in range(1, L2 + 1):
            c2 = Bc[:, j - 1]
            k = da[ridx, c2]
            l_ = db
            eq = c1 == c2
            db = np.where(eq, j, db)
            trans = D[ridx, k, l_] + (i - k - 1) + 1 + (j - l_ - 1)
            D[:, i + 1, j + 1] = np.minimum(
                np.minimum(D[:, i, j] + (~eq), D[:, i + 1, j] + 1),
                np.minimum(D[:, i, j + 1] + 1, trans),
            )
        da[ridx, c1] = i
    return D[ridx, len1 + 1, len2 + 1].astype(np.int64)


def _levenshtein_np(strs1: list[str], strs2: list[str]) -> np.ndarray:
    """Vectorized Levenshtein distance for a batch: the per-pair
    Wagner–Fischer row loop (with the min-plus prefix trick for the
    deletion term) lifted to (batch, chars) matrices — one numpy pass per
    s1 character position instead of per pair. Rows whose s1 is exhausted
    capture their answer and then compute ignored garbage."""
    A, len1 = _encode_pad(strs1)
    Bm, len2 = _encode_pad(strs2)
    B, (L1, L2) = len(strs1), (A.shape[1], Bm.shape[1])
    ar = np.arange(L2 + 1, dtype=np.int64)
    prev = np.broadcast_to(ar, (B, L2 + 1)).copy()
    ridx = np.arange(B)
    result = np.where(len1 == 0, len2, 0)
    for i in range(L1):
        cur = np.empty_like(prev)
        cur[:, 0] = i + 1
        np.minimum(
            prev[:, :-1] + (Bm != A[:, i][:, None]), prev[:, 1:] + 1,
            out=cur[:, 1:],
        )
        t = cur - ar
        np.minimum.accumulate(t, axis=1, out=t)
        prev = t + ar
        done = len1 == i + 1
        if done.any():
            result[done] = prev[done, len2[done]]
    return result


def _jaro_family_batch(winkler: bool):
    def batch(s1, s2):
        out, idx, strs1, strs2 = _valid_pairs(s1, s2)
        if len(idx) == 0:
            return pd.Series(out)
        lens = np.array([max(len(x), len(y)) for x, y in zip(strs1, strs2)])
        short = lens <= _VEC_MAX_LEN_JARO
        if short.any():
            sub = np.nonzero(short)[0]
            out[idx[sub]] = _jaro_np(
                [strs1[i] for i in sub], [strs2[i] for i in sub], winkler
            )
        kernel = jaro_winkler if winkler else jaro
        for i in np.nonzero(~short)[0]:
            out[idx[i]] = kernel(strs1[i], strs2[i])
        return pd.Series(out)

    return batch


jaro_batch = _jaro_family_batch(winkler=False)
jaro_winkler_batch = _jaro_family_batch(winkler=True)


# ---------------------------------------------------------------------------
# batch-vectorized smith_waterman / lcs (r4) — the last two per-pair
# Python kernels on the Compare.string path. Both DPs vectorize across
# the Arrow batch dimension:
#   - smith_waterman: anti-diagonal sweep. Every cell on diagonal d
#     depends only on diagonals d-1 / d-2 (including the trace-aware gap
#     bits), so one numpy step fills that diagonal for EVERY pair at
#     once. Same float64 op order as the scalar -> bit-identical.
#   - lcs: the inner longest-common-substring pass is row-vectorizable
#     (cur[y] = prev[y-1] + 1 on equality has no within-row dependency);
#     the iterated-excision outer loop re-batches the still-active pairs
#     each round. Integer DP -> exact.
# Pairs longer than the cutoffs fall back to the scalar oracles, which
# also remain the differential-test reference (test_np_kernels.py).
# ---------------------------------------------------------------------------

_VEC_MAX_LEN_SW = 64    # cubes are (chunk, L1+1, L2+1): f64 H + 2 bool traces
_SW_CHUNK = 1024
_VEC_MAX_LEN_LCS = 256  # per-row temporaries are (batch, L2+1) int32
# Padding sentinels: above every codepoint and distinct from each other,
# so a padded position never equals a real character nor the other
# side's padding.
_SENT_A = np.uint32(0xFFFFFFFE)
_SENT_B = np.uint32(0xFFFFFFFD)


def _encode_pad_sentinel(strs: list[str], sent: np.uint32):
    M, lens = _encode_pad(strs)
    M[np.arange(M.shape[1])[None, :] >= lens[:, None]] = sent
    return M, lens


def _smith_waterman_np(
    strs1: list[str],
    strs2: list[str],
    match: float = 5.0,
    mismatch: float = -5.0,
    gap_start: float = -5.0,
    gap_continue: float = -1.0,
) -> np.ndarray:
    """Highest local-alignment score per pair, anti-diagonal sweep.

    Requires mismatch/gap penalties <= 0 (true for the reference's
    parameterization, string.py:155-357): then every path through the
    sentinel-padded region strictly decreases, so max over the padded
    matrix equals max over the valid region and no per-pair masking is
    needed."""
    if mismatch > 0 or gap_start > 0 or gap_continue > 0:
        raise ValueError("vectorized smith_waterman requires penalties <= 0")
    A, _ = _encode_pad_sentinel(strs1, _SENT_A)
    Bm, _ = _encode_pad_sentinel(strs2, _SENT_B)
    B, L1, L2 = len(strs1), A.shape[1], Bm.shape[1]
    eq = A[:, :, None] == Bm[:, None, :]  # (B, L1, L2)
    H = np.zeros((B, L1 + 1, L2 + 1))
    trH = np.zeros((B, L1 + 1, L2 + 1), dtype=bool)  # scalar's trace bit 2
    trV = np.zeros((B, L1 + 1, L2 + 1), dtype=bool)  # scalar's trace bit 4
    for d in range(2, L1 + L2 + 1):
        xs = np.arange(max(1, d - L2), min(L1, d - 1) + 1)
        ys = d - xs
        diag = H[:, xs - 1, ys - 1] + np.where(eq[:, xs - 1, ys - 1], match, mismatch)
        gh = H[:, xs - 1, ys] + np.where(trH[:, xs - 1, ys], gap_continue, gap_start)
        gv = H[:, xs, ys - 1] + np.where(trV[:, xs, ys - 1], gap_continue, gap_start)
        score = np.maximum(np.maximum(diag, gh), gv)
        pos = score > 0
        score = np.where(pos, score, 0.0)
        H[:, xs, ys] = score
        trH[:, xs, ys] = pos & (score == gh)
        trV[:, xs, ys] = pos & (score == gv)
    return H.reshape(B, -1).max(axis=1)


def smith_waterman_batch(s1, s2):
    """Mean-normalized Smith-Waterman at the reference defaults,
    vectorized for pairs with both strings <= _VEC_MAX_LEN_SW chars
    (chunked so the DP cubes stay ~<=35 MB); longer pairs use the scalar
    oracle kernel."""
    out, idx, strs1, strs2 = _valid_pairs(s1, s2)
    if len(idx) == 0:
        return pd.Series(out)
    l1 = np.fromiter((len(x) for x in strs1), dtype=np.int64, count=len(strs1))
    l2 = np.fromiter((len(x) for x in strs2), dtype=np.int64, count=len(strs2))
    nz = (l1 > 0) & (l2 > 0)
    out[idx[~nz]] = 0.0  # scalar early-return for an empty side
    short = nz & (l1 <= _VEC_MAX_LEN_SW) & (l2 <= _VEC_MAX_LEN_SW)
    sub = np.nonzero(short)[0]
    for c0 in range(0, len(sub), _SW_CHUNK):
        chunk = sub[c0 : c0 + _SW_CHUNK]
        hi = _smith_waterman_np(
            [strs1[i] for i in chunk], [strs2[i] for i in chunk]
        )
        out[idx[chunk]] = 2.0 * hi / ((l1[chunk] + l2[chunk]) * 5.0)
    for i in np.nonzero(nz & ~short)[0]:
        out[idx[i]] = smith_waterman_sim(strs1[i], strs2[i])
    return pd.Series(out)


def _lcs_once_np(A: np.ndarray, Bm: np.ndarray):
    """Vectorized _lcs_once across the batch: per pair, the length and
    (1-based) end positions of the first-found longest common substring
    — same tie-breaking as the scalar (first row with a strictly longer
    match; first column achieving that row's max)."""
    Bn, L1, L2 = A.shape[0], A.shape[1], Bm.shape[1]
    prev = np.zeros((Bn, L2 + 1), dtype=np.int32)
    cur = np.zeros((Bn, L2 + 1), dtype=np.int32)
    best = np.zeros(Bn, dtype=np.int32)
    x_end = np.zeros(Bn, dtype=np.int64)
    y_end = np.zeros(Bn, dtype=np.int64)
    for x in range(1, L1 + 1):
        eq_row = A[:, x - 1, None] == Bm  # (Bn, L2)
        cur[:, 1:] = np.where(eq_row, prev[:, :-1] + 1, 0)
        rowmax = cur.max(axis=1)
        upd = rowmax > best
        if upd.any():
            am = cur.argmax(axis=1)
            best = np.where(upd, rowmax, best)
            x_end = np.where(upd, x, x_end)
            y_end = np.where(upd, am, y_end)
        prev, cur = cur, prev
    return best, x_end, y_end


def _lcs_accumulate_np(strs1: list[str], strs2: list[str], min_len: int) -> np.ndarray:
    """Batched iterated-LCS accumulation (scalar lcs_sim's accumulate):
    each round runs the vectorized LCS pass over the still-active pairs,
    then excises the found substring per pair (O(1) string slices)."""
    n = len(strs1)
    acc = np.zeros(n, dtype=np.int64)
    cur1, cur2 = list(strs1), list(strs2)
    active = [i for i in range(n) if min(len(cur1[i]), len(cur2[i])) >= min_len]
    while active:
        A, _ = _encode_pad_sentinel([cur1[i] for i in active], _SENT_A)
        Bm, _ = _encode_pad_sentinel([cur2[i] for i in active], _SENT_B)
        best, x_end, y_end = _lcs_once_np(A, Bm)
        nxt = []
        for k, i in enumerate(active):
            ln = int(best[k])
            if ln < min_len:
                continue
            acc[i] += ln
            xe, ye = int(x_end[k]), int(y_end[k])
            cur1[i] = cur1[i][: xe - ln] + cur1[i][xe:]
            cur2[i] = cur2[i][: ye - ln] + cur2[i][ye:]
            if min(len(cur1[i]), len(cur2[i])) >= min_len:
                nxt.append(i)
        active = nxt
    return acc


def lcs_batch(s1, s2):
    """Dice-normalized iterated-LCS (both orderings averaged, scalar
    lcs_sim defaults), vectorized for pairs with both strings <=
    _VEC_MAX_LEN_LCS chars; longer pairs use the scalar oracle kernel."""
    out, idx, strs1, strs2 = _valid_pairs(s1, s2)
    if len(idx) == 0:
        return pd.Series(out)
    l1 = np.fromiter((len(x) for x in strs1), dtype=np.int64, count=len(strs1))
    l2 = np.fromiter((len(x) for x in strs2), dtype=np.int64, count=len(strs2))
    nz = (l1 > 0) & (l2 > 0)
    out[idx[~nz]] = 0.0  # scalar normalize() returns 0.0 for an empty side
    short = nz & (l1 <= _VEC_MAX_LEN_LCS) & (l2 <= _VEC_MAX_LEN_LCS)
    sub = np.nonzero(short)[0]
    if len(sub):
        sub1 = [strs1[i] for i in sub]
        sub2 = [strs2[i] for i in sub]
        a12 = _lcs_accumulate_np(sub1, sub2, 2)
        a21 = _lcs_accumulate_np(sub2, sub1, 2)
        tot = (l1[sub] + l2[sub]).astype(np.float64)
        out[idx[sub]] = (a12 * 2.0 / tot + a21 * 2.0 / tot) / 2.0
    for i in np.nonzero(nz & ~short)[0]:
        out[idx[i]] = lcs_sim(strs1[i], strs2[i])
    return pd.Series(out)


# ---------------------------------------------------------------------------
# batch-vectorized qgram / cosine (r4)
#
# The scalar char_wb_ngrams/Counter kernels above stay as the
# differential-test oracles; the batch path extracts every char_wb
# n-gram of the whole Arrow batch as rows of ONE padded uint32 codepoint
# matrix, identifies grams exactly with a single np.unique over the raw
# bytes (content-based like the Counter keys — no hash collisions), and
# reduces Σmin / dot / norms with segmented bincounts keyed on
# (pair, gram). Unicode normalization stays per-string (C-speed,
# unconditionally correct for NFKD edge cases); everything per-GRAM —
# the actual hot loop — is numpy. No length cutoff needed: cost is
# linear in total characters, unlike the O(n·m) DP kernels.
# ---------------------------------------------------------------------------

_GRAM_PAD = np.uint32(0xFFFFFFFF)  # > any codepoint: pads shorter grams


def _char_wb_gram_rows(strs: list[str], n_min: int, n_max: int):
    """(rows, owner): all char_wb n-gram instances of the batch as a
    (m, n_max) uint32 matrix (sentinel-padded) + owning string index.

    Mirrors char_wb_ngrams exactly: per whitespace token w padded to
    ``" w "`` (length tl), each n in [n_min, n_max] with n < tl emits
    the tl-n+1 sliding windows; a token with tl <= n_max additionally
    emits the whole padded token ONCE (the scalar's count-once-and-break
    branch)."""
    toks: list[str] = []
    owner_l: list[int] = []
    for i, s in enumerate(strs):
        for w in _strip_accents_unicode(s.lower()).split():
            toks.append(f" {w} ")
            owner_l.append(i)
    if not toks:
        return np.empty((0, n_max), dtype=np.uint32), np.empty(0, np.int64)
    codes = np.frombuffer("".join(toks).encode("utf-32-le"), dtype=np.uint32)
    tl = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    tstart = np.concatenate(([0], np.cumsum(tl)[:-1]))
    towner = np.asarray(owner_l, dtype=np.int64)
    parts, owners = [], []
    for n in range(n_min, n_max + 1):
        cnt = np.where(tl > n, tl - n + 1, 0)
        m = int(cnt.sum())
        if m:
            seg_off = np.repeat(np.cumsum(cnt) - cnt, cnt)
            win = np.repeat(tstart, cnt) + (np.arange(m) - seg_off)
            W = np.full((m, n_max), _GRAM_PAD, dtype=np.uint32)
            W[:, :n] = codes[win[:, None] + np.arange(n)[None, :]]
            parts.append(W)
            owners.append(np.repeat(towner, cnt))
    whole = np.nonzero(tl <= n_max)[0]
    if len(whole):
        m = len(whole)
        W = np.full((m, n_max), _GRAM_PAD, dtype=np.uint32)
        col = np.arange(n_max)[None, :]
        mask = col < tl[whole][:, None]
        W[mask] = codes[(tstart[whole][:, None] + col)[mask]]
        parts.append(W)
        owners.append(towner[whole])
    return np.concatenate(parts), np.concatenate(owners)


def _char_wb_sims_np(strs1, strs2, n_min, n_max):
    """(qgram, cosine) similarity arrays for a batch of string pairs.

    Both measures come from the same segmented (pair, gram, side) counts,
    with the scalar kernels' exact formulas (so results are bit-identical:
    integer counts, same float expression)."""
    npairs = len(strs1)
    r1, o1 = _char_wb_gram_rows(strs1, n_min, n_max)
    r2, o2 = _char_wb_gram_rows(strs2, n_min, n_max)
    q = np.full(npairs, np.nan)
    c = np.full(npairs, np.nan)
    rows = np.ascontiguousarray(np.concatenate([r1, r2]))
    if len(rows) == 0:
        return q, c
    # gram identity: pack each row into ONE uint64 where it fits (the
    # default n_max=2 packs two raw codepoints; n_max=3 packs three
    # 21-bit codepoints with the sentinel remapped to 0x110000) — an
    # int64 np.unique sorts ~10x faster than the structured/void
    # comparator needed for wider rows
    w = rows.shape[1]
    if w <= 2:
        packed = rows[:, 0].astype(np.uint64) << np.uint64(32)
        if w == 2:
            packed |= rows[:, 1].astype(np.uint64)
        _, gram_id = np.unique(packed, return_inverse=True)
    elif w == 3:
        packed = np.zeros(len(rows), dtype=np.uint64)
        for j in range(3):
            col = np.minimum(rows[:, j], np.uint32(0x110000)).astype(np.uint64)
            packed = (packed << np.uint64(21)) | col
        _, gram_id = np.unique(packed, return_inverse=True)
    else:
        void = rows.view([("", rows.dtype)] * w).ravel()
        _, gram_id = np.unique(void, return_inverse=True)
    g1, g2 = gram_id[: len(o1)], gram_id[len(o1):]
    G = int(gram_id.max()) + 1
    k1 = o1 * G + g1
    k2 = o2 * G + g2
    uk, inv = np.unique(np.concatenate([k1, k2]), return_inverse=True)
    cA = np.bincount(inv[: len(k1)], minlength=len(uk)).astype(np.float64)
    cB = np.bincount(inv[len(k1):], minlength=len(uk)).astype(np.float64)
    pair_of = uk // G
    totA = np.bincount(o1, minlength=npairs)
    totB = np.bincount(o2, minlength=npairs)
    tot = np.maximum(totA, totB)
    match = np.bincount(pair_of, weights=np.minimum(cA, cB), minlength=npairs)
    nz = tot > 0
    q[nz] = match[nz] / tot[nz]
    a = np.sqrt(np.bincount(pair_of, weights=cA * cA, minlength=npairs))
    b = np.sqrt(np.bincount(pair_of, weights=cB * cB, minlength=npairs))
    dot = np.bincount(pair_of, weights=cA * cB, minlength=npairs)
    ok = (a > 0) & (b > 0)
    c[ok] = dot[ok] / (a[ok] * b[ok])
    return q, c


def _char_wb_family_batch(which: str):
    def batch(s1, s2):
        out, idx, strs1, strs2 = _valid_pairs(s1, s2)
        if len(idx) == 0:
            return pd.Series(out)
        q, c = _char_wb_sims_np(strs1, strs2, 2, 2)
        out[idx] = q if which == "qgram" else c
        return pd.Series(out)

    return batch


qgram_batch = _char_wb_family_batch("qgram")
cosine_batch = _char_wb_family_batch("cosine")




def levenshtein_batch(s1, s2):
    """1 - distance / max(len), batch-vectorized like the damerau kernel
    (scalar Wagner–Fischer stays as the fallback for very long strings
    and as the differential-test oracle)."""
    out, idx, strs1, strs2 = _valid_pairs(s1, s2)
    if len(idx) == 0:
        return pd.Series(out)
    l1 = np.fromiter((len(x) for x in strs1), dtype=np.int64, count=len(strs1))
    l2 = np.fromiter((len(x) for x in strs2), dtype=np.int64, count=len(strs2))
    mx = np.maximum(l1, l2)
    short = (l1 <= _VEC_MAX_LEN_JARO) & (l2 <= _VEC_MAX_LEN_JARO) & (mx > 0)
    sub = np.nonzero(short)[0]
    if len(sub):
        d = _levenshtein_np([strs1[i] for i in sub], [strs2[i] for i in sub])
        out[idx[sub]] = 1.0 - d / mx[sub]
    for i in np.nonzero(~short)[0]:
        if mx[i] == 0:
            continue  # 0/0 -> NaN, matching the reference's numpy warning path
        out[idx[i]] = 1.0 - levenshtein_distance(strs1[i], strs2[i]) / mx[i]
    return pd.Series(out)


def damerau_levenshtein_batch(s1, s2):
    """1 - DL_distance / max(len), vectorized across the batch for pairs
    with both strings <= _VEC_MAX_LEN_DL chars (chunked so the DP cube
    stays ~<=20 MB); longer pairs use the scalar oracle kernel."""
    out, idx, strs1, strs2 = _valid_pairs(s1, s2)
    if len(idx) == 0:
        return pd.Series(out)
    l1 = np.fromiter((len(x) for x in strs1), dtype=np.int64, count=len(strs1))
    l2 = np.fromiter((len(x) for x in strs2), dtype=np.int64, count=len(strs2))
    mx = np.maximum(l1, l2)
    short = (l1 <= _VEC_MAX_LEN_DL) & (l2 <= _VEC_MAX_LEN_DL) & (mx > 0)
    sub = np.nonzero(short)[0]
    for c0 in range(0, len(sub), _DL_CHUNK):
        chunk = sub[c0 : c0 + _DL_CHUNK]
        d = _damerau_np([strs1[i] for i in chunk], [strs2[i] for i in chunk])
        out[idx[chunk]] = 1.0 - d / mx[chunk]
    for i in np.nonzero(~short)[0]:
        if mx[i] == 0:
            continue  # 0/0 -> NaN, matching the reference's numpy warning path
        out[idx[i]] = 1.0 - damerau_levenshtein_distance(strs1[i], strs2[i]) / mx[i]
    return pd.Series(out)
