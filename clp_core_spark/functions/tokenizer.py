"""Vectorized CLP tokenizer / logtype builder (pandas + numpy, no per-row
Python in the parse path — one C-level regex pass + columnar classification).

Semantics re-implemented from the reference (y-scope/clp):

* Delimiters: every char EXCEPT ``+ - . 0-9 A-Z \\ _ a-z``
  (components/core/src/clp/ir/parsing.cpp:20-24).
* A token (maximal run of non-delimiters) is a *variable* iff it
  (a) contains a decimal digit, or (b) is directly preceded by ``=`` and
  contains an alphabetic char, or (c) could be a multi-digit hex value
  (components/core/src/clp/ir/parsing.cpp:43-94, parsing.hpp:36-49).
* The logtype is the message with each variable replaced by a placeholder
  byte — Integer=0x11, Dictionary=0x12, Float=0x13 — and every literal
  occurrence of a placeholder byte or backslash escaped with a backslash
  (components/core/src/clp/ir/types.hpp:11-16, ir/parsing.inc:12-33,
  clp/LogTypeDictionaryEntry.cpp:64-103).
* Variable classing (int / float / dictionary) follows
  clp/EncodedVariableInterpreter.cpp:31-149 (see encoder.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from clp_core_spark.functions import encoder

# Placeholder bytes (clp/ir/types.hpp:11-16).
PLACEHOLDER_INT = "\x11"
PLACEHOLDER_DICT = "\x12"
PLACEHOLDER_FLOAT = "\x13"
ESCAPE_CHAR = "\\"

# Variable type codes used in the encoded table's `var_types` arrays.
VT_INT = 0
VT_FLOAT = 1
VT_DICT = 2

_PLACEHOLDER_FOR_TYPE = {VT_INT: PLACEHOLDER_INT, VT_FLOAT: PLACEHOLDER_FLOAT,
                         VT_DICT: PLACEHOLDER_DICT}

# Token charset per is_delim (parsing.cpp:20-24): '+', '-'..'.', digits,
# upper, '\', '_', lower.  NOTE '-'..'.' is the ASCII range {'-', '.'}
# ('/' is NOT included: '-' is 0x2D, '.' is 0x2E, '/' is 0x2F).
_TOKEN_CLASS = r"+\-.0-9A-Za-z\\_"
# One alternation: a delimiter run OR a token run. extractall() walks the
# string once in C and returns every segment in order.
_SEGMENT_RE = re.compile(rf"(?P<d>[^{_TOKEN_CLASS}]+)|(?P<t>[{_TOKEN_CLASS}]+)")

# Chars needing escape inside logtype constants (parsing.inc:20-31).
_ESCAPE_RE = re.compile(r"([\x11\x12\x13\\])")

# Variable decision regexes (parsing.cpp:64-94, parsing.hpp:36-49).
_HAS_DIGIT_RE = re.compile(r"[0-9]")
_HAS_ALPHA_RE = re.compile(r"[A-Za-z]")
_HEX_RE = re.compile(r"[0-9a-fA-F]{2,}")


def _escape_series(s: pd.Series) -> pd.Series:
    """Escape placeholder bytes / backslash in logtype constants."""
    return s.str.replace(_ESCAPE_RE, r"\\\1", regex=True)


def tokenize_frame(texts: pd.Series) -> pd.DataFrame:
    """Tokenize + encode a batch of messages.

    Returns a DataFrame aligned to ``texts.index`` with columns:

    - ``logtype``: template string, placeholders embedded, constants escaped
    - ``var_strs``: list[str], every variable in order of appearance
    - ``var_types``: list[int8], VT_INT / VT_FLOAT / VT_DICT per variable
    - ``encoded``: list[int64] — CLP encoded variable per position; int
      vars hold the value, float vars hold the 64-bit CLP float packing,
      dict vars hold the 0-based ordinal of that dict var *within the row*
      (replaced by the global dictionary ID after the dictionary join).
    - ``dict_strs``: list[str], only the dictionary-variable strings in order
    """
    texts = texts.fillna("").astype(str)
    idx = texts.index

    parts = texts.str.extractall(_SEGMENT_RE)
    if parts.empty:
        empty = pd.DataFrame(
            {
                "logtype": pd.Series([""] * len(idx), index=idx, dtype=object),
                "var_strs": [[] for _ in idx],
                "var_types": [[] for _ in idx],
                "encoded": [[] for _ in idx],
                "dict_strs": [[] for _ in idx],
            },
            index=idx,
        )
        return empty

    tok = parts["t"]
    delim = parts["d"]
    is_tok = tok.notna()
    match_num = parts.index.get_level_values("match")

    # Char directly before a token is the last char of the preceding delim
    # segment (segments alternate and tile the string); a token with
    # match==0 sits at the start of the message (parsing.cpp:86 checks
    # str[begin_pos-1]).
    prev_delim = delim.shift(1)
    preceded_by_eq = (match_num != 0) & (prev_delim.str.endswith("=") == True).to_numpy()  # noqa: E712

    has_digit = tok.str.contains(_HAS_DIGIT_RE, na=False).to_numpy()
    has_alpha = tok.str.contains(_HAS_ALPHA_RE, na=False).to_numpy()
    is_hex = tok.str.fullmatch(_HEX_RE, na=False).to_numpy()
    is_var = is_tok.to_numpy() & (has_digit | (preceded_by_eq & has_alpha) | is_hex)

    var_tok = tok[is_var]
    is_int_v, int_vals = encoder.classify_encode_int(var_tok)
    is_float_v, float_vals = encoder.classify_encode_float(var_tok)
    is_float_v &= ~is_int_v  # int is checked first (EncodedVariableInterpreter.cpp:439-446)

    var_types = np.full(len(var_tok), VT_DICT, dtype=np.int8)
    var_types[is_int_v.to_numpy()] = VT_INT
    var_types[is_float_v.to_numpy()] = VT_FLOAT

    encoded_vals = np.zeros(len(var_tok), dtype=np.int64)
    encoded_vals[is_int_v.to_numpy()] = int_vals
    encoded_vals[is_float_v.to_numpy()] = float_vals
    # Dict slots: ordinal of the dict var within its row.
    is_dict_v = var_types == VT_DICT
    row_of_var = var_tok.index.get_level_values(0)
    dict_rows = pd.Series(np.ones(int(is_dict_v.sum()), dtype=np.int64),
                          index=row_of_var[is_dict_v])
    if len(dict_rows):
        encoded_vals[is_dict_v] = (dict_rows.groupby(level=0).cumsum() - 1).to_numpy()

    # --- logtype assembly: per segment emit escaped-constant or placeholder.
    seg_out = pd.Series(index=parts.index, dtype=object)
    seg_out.loc[~is_tok.to_numpy()] = _escape_series(delim[~is_tok.to_numpy()])
    const_tok_mask = is_tok.to_numpy() & ~is_var
    seg_out.loc[const_tok_mask] = _escape_series(tok[const_tok_mask])
    placeholder_series = pd.Series(var_types, index=var_tok.index).map(_PLACEHOLDER_FOR_TYPE)
    seg_out.loc[is_var] = placeholder_series

    logtype = seg_out.groupby(level=0).agg("".join).reindex(idx, fill_value="")

    # --- per-row aggregation of variable columns.
    def _agg_lists(values: pd.Series, caster) -> pd.Series:
        if values.empty:
            return pd.Series([[] for _ in idx], index=idx, dtype=object)
        grouped = values.groupby(level=0).agg(list).map(caster)
        out = grouped.reindex(idx)
        miss = out.isna()
        if miss.any():
            out[miss] = pd.Series([[] for _ in range(int(miss.sum()))],
                                  index=out.index[miss], dtype=object)
        return out

    ident = lambda x: x  # noqa: E731
    var_strs = _agg_lists(var_tok, ident)
    var_types_col = _agg_lists(pd.Series(var_types, index=var_tok.index), ident)
    encoded_col = _agg_lists(pd.Series(encoded_vals, index=var_tok.index), ident)
    dict_strs = _agg_lists(var_tok[is_dict_v], ident)

    return pd.DataFrame(
        {
            "logtype": logtype,
            "var_strs": var_strs,
            "var_types": var_types_col,
            "encoded": encoded_col,
            "dict_strs": dict_strs,
        },
        index=idx,
    )


# --- decoding ---------------------------------------------------------------

# Logtype scanner: escaped pair | placeholder byte | constant run.
_LOGTYPE_SEG_RE = re.compile(r"(?P<e>\\[\x11\x12\x13\\])|(?P<p>[\x11\x12\x13])|(?P<c>[^\x11\x12\x13\\]+|\\)")


def decode_frame(
    logtypes: pd.Series,
    encoded: pd.Series,
    dict_strs: pd.Series,
) -> pd.Series:
    """Inverse of :func:`tokenize_frame` — rebuild the original message.

    Mirrors clp/EncodedVariableInterpreter.cpp:298-367
    (decode_variables_into_message): walk the logtype, substitute each
    placeholder with the decoded variable, unescape escaped bytes.

    ``encoded`` holds per-row int64 lists (dict slots may carry either
    row ordinals or global dictionary IDs — they are ignored);
    ``dict_strs`` holds the row's dictionary-variable strings in order of
    appearance (i.e. dictionary IDs already resolved to strings by the
    caller via the var-dict join). The Nth dictionary placeholder in the
    logtype consumes ``dict_strs[N]``.
    """
    logtypes = logtypes.fillna("").astype(str)
    idx = logtypes.index

    parts = logtypes.str.extractall(_LOGTYPE_SEG_RE)
    if parts.empty:
        return pd.Series([""] * len(idx), index=idx, dtype=object)

    seg_out = pd.Series(index=parts.index, dtype=object)
    const_mask = parts["c"].notna().to_numpy()
    seg_out.loc[const_mask] = parts["c"][const_mask]
    esc_mask = parts["e"].notna().to_numpy()
    seg_out.loc[esc_mask] = parts["e"][esc_mask].str[1]

    ph = parts["p"]
    ph_mask = ph.notna().to_numpy()
    if ph_mask.any():
        ph_rows = parts.index.get_level_values(0)[ph_mask]
        ph_ord = pd.Series(np.ones(int(ph_mask.sum()), dtype=np.int64), index=ph_rows)
        ph_ord = (ph_ord.groupby(level=0).cumsum() - 1).to_numpy()

        # Explode per-row encoded / dict lists into flat arrays keyed by
        # (row, ordinal) and align with placeholder occurrences.
        enc_flat = encoded.explode()
        enc_flat = enc_flat[enc_flat.notna()]
        enc_rows = enc_flat.index
        enc_ord = (pd.Series(np.ones(len(enc_flat), dtype=np.int64), index=enc_rows)
                   .groupby(level=0).cumsum() - 1).to_numpy()
        enc_key = pd.MultiIndex.from_arrays([enc_rows, enc_ord])
        enc_by_key = pd.Series(enc_flat.to_numpy(dtype=np.int64), index=enc_key)

        dict_flat = dict_strs.explode()
        dict_flat = dict_flat[dict_flat.notna()]
        dict_rows = dict_flat.index
        dict_ord = (pd.Series(np.ones(len(dict_flat), dtype=np.int64), index=dict_rows)
                    .groupby(level=0).cumsum() - 1).to_numpy()
        dict_key = pd.MultiIndex.from_arrays([dict_rows, dict_ord])
        dict_by_key = pd.Series(dict_flat.to_numpy(dtype=object), index=dict_key)

        ph_key = pd.MultiIndex.from_arrays([ph_rows, ph_ord])
        ph_vals = enc_by_key.reindex(ph_key).to_numpy(dtype=np.int64)
        ph_char = ph[ph_mask].to_numpy()

        out_strs = np.empty(len(ph_vals), dtype=object)
        int_m = ph_char == PLACEHOLDER_INT
        if int_m.any():
            out_strs[int_m] = pd.Series(ph_vals[int_m]).astype(str).to_numpy()
        float_m = ph_char == PLACEHOLDER_FLOAT
        if float_m.any():
            out_strs[float_m] = encoder.decode_float_batch(ph_vals[float_m])
        dict_m = ph_char == PLACEHOLDER_DICT
        if dict_m.any():
            # Nth dict placeholder in a row -> dict_strs[N] for that row.
            dict_ph_ord = (pd.Series(np.ones(int(dict_m.sum()), dtype=np.int64),
                                     index=ph_rows[dict_m])
                           .groupby(level=0).cumsum() - 1).to_numpy()
            dm_key = pd.MultiIndex.from_arrays([ph_rows[dict_m], dict_ph_ord])
            out_strs[dict_m] = dict_by_key.reindex(dm_key).to_numpy(dtype=object)

        seg_out.loc[ph_mask] = pd.Series(out_strs, index=parts.index[ph_mask])

    return seg_out.groupby(level=0).agg("".join).reindex(idx, fill_value="")
