"""Bit-exact CLP variable encodings, vectorized with numpy/pandas.

Re-implements (from the reference, y-scope/clp):

* ``convert_string_to_representable_integer_var``
  (components/core/src/clp/EncodedVariableInterpreter.cpp:31-68):
  optional ``-`` then digits, no ``+``, no zero-padding (``0`` alone OK,
  ``-0`` not), must fit int64; value stored verbatim as int64.
* ``convert_string_to_representable_float_var`` (:70-149): optional ``-``,
  digits with exactly one ``.`` that is not the last char, 1..16 digits
  total (zero-padding allowed — ``-00.00`` is representable); packed as
  [1b neg | 1b unused | 54b digits-as-int | 4b num_digits-1 |
  4b decimal-pos-from-right-1].
* ``convert_encoded_float_to_string`` (:151-204): exact inverse, digit
  string reproduced verbatim including leading zeros.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_DIGITS_MASK = (1 << 54) - 1  # cEightByteEncodedFloatDigitsBitMask

_INT_FORM_RE = re.compile(r"0|[1-9][0-9]*|-[1-9][0-9]*")
_FLOAT_FORM_RE = re.compile(r"-?[0-9]*\.[0-9]+")

_INT64_MAX_STR = "9223372036854775807"
_INT64_MIN_ABS_STR = "9223372036854775808"


def classify_encode_int_arrow(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow-native variant of :func:`classify_encode_int`: takes a
    pyarrow StringArray, returns (bool ndarray mask, int64 values for the
    masked positions). All regex/compare/cast work is RE2/C++."""
    import pyarrow as pa
    import pyarrow.compute as pc

    form = np.asarray(
        pc.match_substring_regex(arr, "^(?:0|[1-9][0-9]*|-[1-9][0-9]*)$")
    ).astype(bool)
    if not form.any():
        return form, np.empty(0, dtype=np.int64)
    cand = pc.filter(arr, pa.array(form))
    neg = pc.starts_with(cand, pattern="-")
    digits = pc.utf8_ltrim(cand, characters="-")
    ndig = np.asarray(pc.utf8_length(digits))
    limit = pc.if_else(neg, _INT64_MIN_ABS_STR, _INT64_MAX_STR)
    in_range = (ndig < 19) | (
        (ndig == 19) & np.asarray(pc.less_equal(digits, limit)).astype(bool)
    )
    mask = form.copy()
    pos = np.flatnonzero(form)
    mask[pos[~in_range]] = False
    vals = np.asarray(
        pc.cast(pc.filter(cand, pa.array(in_range)), pa.int64())
    ).astype(np.int64)
    return mask, vals


def classify_encode_float_arrow(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow-native variant of :func:`classify_encode_float`."""
    import pyarrow as pa
    import pyarrow.compute as pc

    form = np.asarray(
        pc.match_substring_regex(arr, r"^-?[0-9]*\.[0-9]+$")
    ).astype(bool)
    if not form.any():
        return form, np.empty(0, dtype=np.int64)
    cand = pc.filter(arr, pa.array(form))
    neg = np.asarray(pc.starts_with(cand, pattern="-")).astype(bool)
    body = pc.utf8_ltrim(cand, characters="-")
    digit_str = pc.replace_substring(body, pattern=".", replacement="")
    ndig = np.asarray(pc.utf8_length(digit_str)).astype(np.int64)
    dot_pos = np.asarray(pc.find_substring(body, pattern=".")).astype(np.int64)
    body_len = np.asarray(pc.utf8_length(body)).astype(np.int64)
    dec_from_right = body_len - 1 - dot_pos

    representable = ndig <= 16
    mask = form.copy()
    pos = np.flatnonzero(form)
    mask[pos[~representable]] = False

    digits_val = np.asarray(
        pc.cast(pc.filter(digit_str, pa.array(representable)), pa.uint64())
    ).astype(np.uint64)
    enc = np.zeros(int(representable.sum()), dtype=np.uint64)
    enc |= np.where(neg[representable], np.uint64(1) << np.uint64(63), np.uint64(0))
    enc |= (digits_val & np.uint64(_DIGITS_MASK)) << np.uint64(8)
    enc |= ((ndig[representable].astype(np.uint64) - 1) & np.uint64(0xF)) << np.uint64(4)
    enc |= (dec_from_right[representable].astype(np.uint64) - 1) & np.uint64(0xF)
    return mask, enc.view(np.int64)


def classify_encode_int(tokens: pd.Series) -> tuple[pd.Series, np.ndarray]:
    """Return (bool mask over `tokens`, int64 values for the masked rows).

    Matches EncodedVariableInterpreter.cpp:31-68 exactly: form check plus
    int64 range check (19-digit boundary compared lexicographically —
    valid because the form forbids leading zeros).
    """
    form = tokens.str.fullmatch(_INT_FORM_RE, na=False)
    if not form.any():
        return form, np.empty(0, dtype=np.int64)
    cand = tokens[form]
    neg = cand.str.startswith("-")
    digits = cand.str.lstrip("-")
    ndig = digits.str.len()
    limit = neg.map({True: _INT64_MIN_ABS_STR, False: _INT64_MAX_STR})
    in_range = (ndig < 19) | ((ndig == 19) & (digits <= limit))
    mask = form.copy()
    mask[form] = in_range.to_numpy()
    ok = cand[in_range.to_numpy()]
    vals = pd.to_numeric(ok, errors="raise").astype(np.int64).to_numpy()
    return mask, vals


def classify_encode_float(tokens: pd.Series) -> tuple[pd.Series, np.ndarray]:
    """Return (bool mask over `tokens`, packed int64 for the masked rows).

    Matches EncodedVariableInterpreter.cpp:70-149.
    """
    form = tokens.str.fullmatch(_FLOAT_FORM_RE, na=False)
    if not form.any():
        return form, np.empty(0, dtype=np.int64)
    cand = tokens[form]
    neg = cand.str.startswith("-").to_numpy()
    body = cand.str.lstrip("-")
    digit_str = body.str.replace(".", "", regex=False)
    ndig = digit_str.str.len().to_numpy(dtype=np.int64)
    # decimal position from the right = len(body) - 1 - index_of('.')
    dot_pos = body.str.find(".").to_numpy(dtype=np.int64)
    dec_from_right = body.str.len().to_numpy(dtype=np.int64) - 1 - dot_pos

    representable = ndig <= 16  # ndig >= 1 and one non-final '.' by the regex
    mask = form.copy()
    mask[form] = representable

    ok = representable
    digits_val = pd.to_numeric(digit_str[ok], errors="raise").astype(np.uint64).to_numpy()
    enc = np.zeros(int(ok.sum()), dtype=np.uint64)
    enc |= np.where(neg[ok], np.uint64(1) << np.uint64(63), np.uint64(0))
    enc |= (digits_val & np.uint64(_DIGITS_MASK)) << np.uint64(8)
    enc |= ((ndig[ok].astype(np.uint64) - 1) & np.uint64(0xF)) << np.uint64(4)
    enc |= (dec_from_right[ok].astype(np.uint64) - 1) & np.uint64(0xF)
    return mask, enc.view(np.int64)


def decode_float_batch(encoded: np.ndarray) -> np.ndarray:
    """Inverse of classify_encode_float (EncodedVariableInterpreter.cpp:151-204).

    Returns an object ndarray of strings, digit-exact (leading zeros kept).
    """
    enc = encoded.astype(np.int64).view(np.uint64)
    dec_pos = (enc & np.uint64(0xF)).astype(np.int64) + 1
    enc >>= np.uint64(4)
    num_digits = (enc & np.uint64(0xF)).astype(np.int64) + 1
    enc >>= np.uint64(4)
    digits = (enc & np.uint64(_DIGITS_MASK)).astype(np.uint64)
    neg = (enc >> np.uint64(55)) > 0

    # Digit string zero-padded on the left to num_digits, dot inserted
    # dec_pos digits from the right.
    dstr = pd.Series(digits).astype(str)
    dstr = dstr.str.pad(1, fillchar="0")  # no-op; keeps dtype str
    widths = pd.Series(num_digits)
    # left-pad each to its own width (vectorized via str.zfill on groups of
    # equal width — at most 16 distinct widths)
    out = np.empty(len(dstr), dtype=object)
    for w in np.unique(num_digits):
        m = (num_digits == w)
        out[m] = dstr[m].str.zfill(int(w)).to_numpy(dtype=object)
    ipart_len = num_digits - dec_pos
    res = np.empty(len(out), dtype=object)
    for d in np.unique(dec_pos):
        m = dec_pos == d
        s = pd.Series(out[m], dtype=object)
        cut = pd.Series(ipart_len[m]).astype(int)
        # all rows in this group share dec_pos=d; split point varies only
        # via num_digits — group again by width
        sub = np.empty(int(m.sum()), dtype=object)
        for w in np.unique(num_digits[m]):
            mm = num_digits[m] == w
            k = int(w - d)
            ss = s[mm]
            sub[mm] = (ss.str[:k] + "." + ss.str[k:]).to_numpy(dtype=object)
        res[m] = sub
    res = np.where(neg, "-" + pd.Series(res, dtype=object), res)
    return res.astype(object)
