"""Property-based fuzzing of the core encode/decode invariant:
decode_frame(tokenize_frame(x)) must equal x byte-for-byte for ARBITRARY
text — the reference's own end-to-end guarantee
(tests/test-clp_s-end_to_end.cpp), pushed through adversarial inputs
(unicode, NUL bytes, placeholder bytes, escape chars, wildcard chars,
numeric edge forms) at the pandas level, where hundreds of examples cost
no Spark jobs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from clp_core_spark.functions.encoder import decode_float_batch
from clp_core_spark.functions.tokenizer import (
    PLACEHOLDER_DICT,
    PLACEHOLDER_FLOAT,
    PLACEHOLDER_INT,
    decode_frame,
    tokenize_frame,
)

# text incl. the engine's own metacharacters and tricky classes
_special = st.sampled_from(
    [
        PLACEHOLDER_INT, PLACEHOLDER_DICT, PLACEHOLDER_FLOAT,
        "\\", "*", "?", "\x00", "=", "\n", "\t", " ",
        "0", "9", ".", "-", "+", "a", "Z", "é", "日",
    ]
)
_texts = st.lists(
    st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=1, max_codepoint=0x2FF), _special
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=40,
)


def _roundtrip(texts: list[str]) -> pd.Series:
    s = pd.Series(texts, dtype=object)
    parsed = tokenize_frame(s)
    return decode_frame(
        parsed["logtype"],
        pd.Series(parsed["encoded"].tolist(), dtype=object),
        pd.Series(parsed["dict_strs"].tolist(), dtype=object),
    )


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_tokenize_decode_roundtrip_is_identity(texts):
    got = _roundtrip(texts)
    assert list(got) == texts


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**70), max_value=2**70).map(str),
            st.from_regex(r"-?[0-9]{1,20}\.[0-9]{0,18}", fullmatch=True),
            st.from_regex(r"[0-9a-fA-F]{2,16}", fullmatch=True),
            st.from_regex(r"0{1,3}[0-9]{1,5}", fullmatch=True),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_numeric_token_roundtrip_preserves_formatting(tokens):
    """Zero-padded, overflowing, hex-looking and float-shaped tokens must
    all come back byte-exact — CLP's encode-or-dictionary split
    (EncodedVariableInterpreter.cpp:70-149) must never lose formatting."""
    texts = [" ".join(tokens)]
    assert list(_roundtrip(texts)) == texts


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**70), max_value=2**70))
def test_int_encoding_is_bit_exact(v):
    """Encodable ints store their exact value; out-of-range /
    padded forms must NOT classify as int-encodable."""
    s = pd.Series([str(v)])
    from clp_core_spark.functions.encoder import classify_encode_int

    m, enc = classify_encode_int(s)
    if bool(m.iloc[0]):
        assert int(enc[0]) == v
    else:
        assert not (-(2**63) <= v <= 2**63 - 1)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**15),
    st.integers(min_value=0, max_value=10**15),
    st.booleans(),
)
def test_float_encoding_is_bit_exact(ip, fp, neg):
    from clp_core_spark.functions.encoder import classify_encode_float

    raw = f"{'-' if neg else ''}{ip}.{fp}"
    s = pd.Series([raw])
    m, enc = classify_encode_float(s)
    if bool(m.iloc[0]):
        back = decode_float_batch(np.asarray([int(enc[0])], dtype=np.int64))[0]
        assert back == raw
