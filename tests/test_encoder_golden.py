"""Golden encoder cases ported verbatim from the reference
(tests/test-EncodedVariableInterpreter.cpp:18-420): which strings are
representable integer/float variables, their encoded values, and the
float encode->decode string roundtrip (digit-count preservation)."""

import numpy as np
import pandas as pd
import pytest

from clp_core_spark.functions import encoder

INT64_MAX = 2**63 - 1
INT64_MIN = -(2**63)

# (value, expected encoded int) — convert_string_to_representable_integer_var
INT_ACCEPT = [
    ("0", 0),
    ("-1", -1),
    ("1", 1),
    (str(INT64_MAX), INT64_MAX),
    (str(INT64_MIN), INT64_MIN),
]

# non-integers + unrepresentable forms (test-EncodedVariableInterpreter.cpp:63-190)
INT_REJECT = [
    "", "a", "-", "+", "-a", "+a", "--", "++",
    " 1", "- 1", "1 ", "01", "+1",
    "1u", "1U", "1l", "1L", "1ll", "1LL",
    "0.0", "-0",
]

# float strings whose encode->decode MUST reproduce the exact original
# (digit counts preserved; :196-259)
FLOAT_ROUNDTRIP = [
    "0.0", "-1.0", "1.0", ".1", "-00.00",
    "-999999999999999.9", "-.9999999999999999", ".9999999999999999",
]

# non-doubles + unrepresentable forms (:262-420)
FLOAT_REJECT = [
    "", "a", "-", "+", "-a", "+a", "--", "++",
    ".", "1.", " 1.0", "- 1.0", "1.0 ",
    "+1.0", "1.0f", "1.0F", "1.0l", "1.0L",
    str(2**64 - 1),
]


@pytest.mark.parametrize("value,expected", INT_ACCEPT)
def test_int_accept(value, expected):
    m, v = encoder.classify_encode_int(pd.Series([value]))
    assert bool(m.iloc[0]), value
    assert int(v[0]) == expected


@pytest.mark.parametrize("value", INT_REJECT)
def test_int_reject(value):
    m, _ = encoder.classify_encode_int(pd.Series([value]))
    assert not bool(m.iloc[0]), value


@pytest.mark.parametrize("value", FLOAT_ROUNDTRIP)
def test_float_roundtrip_exact(value):
    m, v = encoder.classify_encode_float(pd.Series([value]))
    assert bool(m.iloc[0]), value
    back = encoder.decode_float_batch(np.asarray([v[0]], dtype=np.int64))
    assert back[0] == value


@pytest.mark.parametrize("value", FLOAT_REJECT)
def test_float_reject(value):
    m, _ = encoder.classify_encode_float(pd.Series([value]))
    assert not bool(m.iloc[0]), value
