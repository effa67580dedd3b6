"""Template-expansion tests (the T3/T4/T13 macro-engine analogs):
argument capture, longest-name-first ordering, nested fixpoint
expansion, recursion pruning, right-wins definition union."""

from theoremsearch_spark.functions.templates import (
    MAX_ITERS,
    expand_templates,
    lift_wrappers,
    parse_defs,
)


def test_basic_argument_capture():  # T3/T4: \def\name#1{...}
    s = "{{def:greet(2)|hello #1, from #2}} {{greet|world|me}}"
    assert expand_templates(s).strip() == "hello world, from me"


def test_zero_arg_and_def_removed():
    s = "{{def:brand(0)|ACME}} buy {{brand}} now"
    out = expand_templates(s)
    assert "ACME" in out and "def:" not in out and "{{brand}}" not in out


def test_longest_name_first():  # latex_parse.py:30,94 ordering
    # if "ab" were substituted first it would partially capture "{{abc}}"
    s = "{{def:ab(0)|X}} {{def:abc(0)|Y}} {{abc}} {{ab}}"
    out = expand_templates(s).split()
    assert out == ["Y", "X"]


def test_nested_fixpoint():  # T13: macros expanding to macros
    s = "{{def:inner(1)|[#1]}} {{def:outer(1)|{{inner|#1}}!}} {{outer|x}}"
    assert expand_templates(s).strip() == "[x]!"


def test_recursion_pruned_not_divergent():  # expand_latex_macros recursion guard
    s = "{{def:loop(0)|again {{loop}}}} {{loop}}"
    out = expand_templates(s, max_iters=5)
    assert len(out) < 10_000  # bounded, no blowup
    assert "again" in out


def test_arity_mismatch_left_intact():
    s = "{{def:f(2)|#1+#2}} {{f|onlyone}}"
    assert "{{f|onlyone}}" in expand_templates(s)


def test_right_wins_definition_union():  # SO2: dict right-wins
    text, defs = parse_defs("{{def:x(0)|old}} {{x}}")
    out = expand_templates("{{x}}", extra_defs={"x": (0, "new")})
    assert out == "new"
    assert defs == {"x": (0, "old")}


def test_wrapper_lifting_inherits_target_body():  # T7: latex_parse.py:128-157
    defs = {
        "thm": (1, "Theorem: #1"),
        "wrap": (1, "{{thm|#1}}"),       # pure passthrough → lifted
        "mixed": (1, "pre {{thm|#1}}"),  # extra text → NOT a wrapper
        "fixed": (0, "{{thm|hello}}"),   # fixed arg, arity differs → not lifted
    }
    lifted = lift_wrappers(defs)
    assert lifted["wrap"] == (1, "Theorem: #1")
    assert lifted["mixed"] == defs["mixed"]
    assert lifted["fixed"] == defs["fixed"]


def test_wrapper_chain_resolves_past_iteration_cap():
    """A chain of wrappers deeper than the fixpoint cap still expands,
    because lifting collapses the chain before substitution."""
    n = MAX_ITERS + 3
    defs = "".join(
        f"{{{{def:w{i}(1)|{{{{w{i + 1}|#1}}}}}}}}" for i in range(n)
    ) + f"{{{{def:w{n}(1)|leaf(#1)}}}}"
    out = expand_templates(defs + " {{w0|z}}")
    assert out.strip() == "leaf(z)"


def test_wrapper_lifting_preserves_surrounding_whitespace():
    """Lifting must produce exactly what fixpoint substitution would:
    whitespace around the wrapped call survives (' {{B}} ' → ' x ', not
    'x' — which would merge adjacent tokens in the expanded text)."""
    defs = {"B": (0, "x"), "W": (0, " {{B}} ")}
    assert lift_wrappers(defs)["W"] == (0, " x ")
    out = expand_templates("{{def:B(0)|x}} {{def:W(0)| {{B}} }} a{{W}}b")
    assert "a x b" in out


def test_wrapper_cycle_guard():
    defs = {"a": (0, "{{b}}"), "b": (0, "{{a}}")}
    lifted = lift_wrappers(defs)  # must terminate; bodies land on a cycle edge
    assert set(lifted) == {"a", "b"}


def test_udf_parity(spark):
    from pyspark.sql import functions as F

    from theoremsearch_spark.functions.templates import expand_templates_udf

    rows = [
        ("a", "{{def:g(1)|<#1>}} {{g|q}}"),
        ("b", "plain text"),
        ("c", None),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = dict(
        df.select("id", expand_templates_udf("text").alias("out")).collect()
    )
    assert got["a"] == expand_templates(rows[0][1])
    assert got["b"] == "plain text"
    assert got["c"] is None
