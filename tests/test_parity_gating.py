"""The scaled-sweep classification tolerance is failure-mode-gated
(ADVICE r11): a classified query's failure is excusable ONLY when its
verdict matches the documented failure shape. A value_mismatch — the
one verdict that means the engine is WRONG — is never excusable, nor
is a spark_error on an oracle-resource row. The tolerance itself is
opt-in via --allow-documented (no path-prefix inference)."""

from tools.check_parity import classification_excuses, parse_args


def test_oracle_resource_rows_excuse_only_resource_shapes():
    n = "kcore_copurchase"
    assert classification_excuses(n, "oracle_timeout", "")
    assert classification_excuses(
        n, "oracle_error",
        'IOException: IO Error: Could not write file "x.tmp": '
        "No space left on device",
    )
    assert classification_excuses(
        n, "oracle_error", "OutOfMemoryException: failed to allocate block"
    )
    # a REAL regression in a classified query must stay red
    assert not classification_excuses(n, "value_mismatch", "")
    assert not classification_excuses(n, "spark_error", "AnalysisException: x")
    assert not classification_excuses(
        n, "oracle_error", "BinderException: column y does not exist"
    )


def test_precondition_rows_excuse_only_the_documented_raise():
    n = "holm_bonferroni_tests"
    assert classification_excuses(
        n, "spark_error",
        "ArrayIndexOutOfBoundsException: [INVALID_ARRAY_INDEX_IN_ELEMENT_AT]"
        " The index 26 is out of bounds.",
    )
    assert classification_excuses(
        n, "oracle_error", "list index 26 out of bounds"
    )
    assert not classification_excuses(n, "value_mismatch", "")
    assert not classification_excuses(n, "oracle_timeout", "")
    assert not classification_excuses(
        n, "spark_error", "AnalysisException: unrelated"
    )


def test_unclassified_queries_never_excused():
    assert not classification_excuses("tpch_q1", "oracle_timeout", "")
    assert not classification_excuses(
        "tpch_q1", "oracle_error", "No space left on device"
    )


def test_allow_documented_defaults_off():
    args = parse_args(["/tmp/x"])
    assert args.allow_documented is False
    args = parse_args(["/tmp/x", "--allow-documented"])
    assert args.allow_documented is True
