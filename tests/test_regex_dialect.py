"""Property-based audit of the Python→Java regex dialect boundary.

``translate_python_regex`` decides whether a ``Pattern`` validator lowers
to native ``rlike`` (Java regex on the executors) or falls back to the
kernel. The property: for every pattern the translator ACCEPTS, the Java
engine must (a) compile the translated pattern — an executor-side
PatternSyntaxException mid-job is the failure mode the translator
exists to prevent — and (b) agree with CPython ``re.match`` on every
subject. Patterns the translator REJECTS (returns None) are always safe:
they take the kernel fallback.

The Java side is evaluated through ``spark._jvm``'s
``java.util.regex.Pattern`` — the exact engine Spark's ``RLike`` uses
(compile + ``matcher(s).find()``) — so this is the executor semantics
without paying a Spark job per example; the native-plan wiring itself is
asserted once in test_lowering_matrix.py.
"""

import re

import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

# grammar alphabets: include regex metacharacters as literals-in-class,
# '-' (range maker), ']' (class-literal rules differ), '\r' and '\n'
# (line-terminator semantics are the classic Java/Python '.'/'$' delta)
_LIT = list("abc01 _")
_CLASS_ATOMS = ["a", "b", "c", "0", "1", "a-c", "0-1", "_", "-", "]", "^", "?", "(", "P", "<", "[", "&"]
_ESCAPES = [r"\d", r"\w", r"\s", r"\.", r"\\", r"\]", r"\["]
_QUANTS = ["", "", "", "*", "+", "?", "{1,2}", "{2}", "*?", "+?"]


@st.composite
def _charclass(draw):
    neg = draw(st.booleans())
    atoms = draw(st.lists(st.sampled_from(_CLASS_ATOMS), min_size=1, max_size=4))
    return "[" + ("^" if neg else "") + "".join(atoms) + "]"


@st.composite
def _atom(draw, depth):
    kinds = ["lit", "esc", "class", "dot"]
    if depth < 2:
        kinds += ["group", "ncgroup", "named"]
    kind = draw(st.sampled_from(kinds))
    if kind == "lit":
        return draw(st.sampled_from(_LIT))
    if kind == "esc":
        return draw(st.sampled_from(_ESCAPES))
    if kind == "class":
        return draw(_charclass())
    if kind == "dot":
        return "."
    inner = draw(_expr(depth + 1))
    if kind == "group":
        return "(" + inner + ")"
    if kind == "ncgroup":
        return "(?:" + inner + ")"
    name = draw(st.sampled_from(["g1", "name", "my_g", "x"]))
    return "(?P<" + name + ">" + inner + ")"


@st.composite
def _expr(draw, depth=0):
    n = draw(st.integers(min_value=1, max_value=4))
    parts = []
    for _ in range(n):
        a = draw(_atom(depth))
        q = draw(st.sampled_from(_QUANTS))
        # quantifying a bare quantifiable atom only (avoid 'a**')
        parts.append(a + q)
    body = "".join(parts)
    if draw(st.booleans()) and depth < 2:
        body = body + "|" + draw(_expr(depth + 1))
    return body


@st.composite
def _pattern(draw):
    body = draw(_expr())
    prefix = draw(st.sampled_from(["", "", "", "(?i)", "(?s)", "(?m)"]))
    suffix = draw(st.sampled_from(["", "", "$", r"\Z"]))
    return prefix + body + suffix


_SUBJECT_CHARS = list("abc01 _]-P<\r\n.")
_EDGE_SUBJECTS = ["", "\n", "a\n", "a\r", "abc", "a-c", "]", "P", "a\rb"]


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=300,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_translated_patterns_agree_with_kernel(spark, data):
    from py4j.protocol import Py4JJavaError

    from valideer_spark.plans.lowering import translate_python_regex

    pat = data.draw(_pattern())
    try:
        cre = re.compile(pat)
    except re.error:
        assume(False)  # grammar produced an invalid Python pattern: skip
    translated = translate_python_regex(pat)
    if translated is None:
        return  # kernel fallback: always safe

    jvm = spark._jvm
    try:
        jpat = jvm.java.util.regex.Pattern.compile(translated)
    except Py4JJavaError as e:
        raise AssertionError(
            "translator accepted %r -> %r but Java rejects it "
            "(would throw PatternSyntaxException on the executors): %s"
            % (pat, translated, e)
        ) from None

    subjects = data.draw(
        st.lists(
            st.text(alphabet=_SUBJECT_CHARS, max_size=6),
            min_size=5,
            max_size=10,
        )
    ) + _EDGE_SUBJECTS
    for s in subjects:
        py = cre.match(s) is not None
        jv = bool(jpat.matcher(s).find())
        assert py == jv, (
            "dialect mismatch on pattern %r (java %r) subject %r: "
            "python re.match=%s, java find=%s" % (pat, translated, s, py, jv)
        )
