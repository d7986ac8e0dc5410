"""Parser unit tests: pattern -> IR goldens and error cases (SURVEY.md §4.2)."""
import pytest

from rejit_tpu.compile import ir
from rejit_tpu.compile.parser import parse
from rejit_tpu.errors import RegexpError


def test_literal_run_merges():
    assert parse("abc") == ir.Lit(b"abc")


def test_dot():
    assert parse(".") == ir.CharClass(ir.DOT)
    assert not (parse(".").bitmap >> 0x0A) & 1


def test_alternation_flattens():
    node = parse("foo|bar|baz")
    assert isinstance(node, ir.Alt)
    assert node.options == (ir.Lit(b"foo"), ir.Lit(b"bar"), ir.Lit(b"baz"))


def test_grouping():
    assert parse("(ab)+") == ir.Rep(ir.Lit(b"ab"), 1, None)


def test_quantifiers():
    assert parse("a*") == ir.Rep(ir.Lit(b"a"), 0, None)
    assert parse("a+") == ir.Rep(ir.Lit(b"a"), 1, None)
    assert parse("a?") == ir.Rep(ir.Lit(b"a"), 0, 1)
    assert parse("a{3}") == ir.Rep(ir.Lit(b"a"), 3, 3)
    assert parse("a{2,}") == ir.Rep(ir.Lit(b"a"), 2, None)
    assert parse("a{2,5}") == ir.Rep(ir.Lit(b"a"), 2, 5)


def test_quantifier_binds_last_atom():
    assert parse("ab*") == ir.Cat((ir.Lit(b"a"), ir.Rep(ir.Lit(b"b"), 0, None)))


def test_malformed_braces_are_literal():
    assert parse("a{") == ir.Lit(b"a{")
    assert parse("a{x}") == ir.Lit(b"a{x}")
    assert parse("a{,3}") == ir.Lit(b"a{,3}")


def test_char_class_ranges():
    node = parse("[a-cx]")
    assert isinstance(node, ir.CharClass)
    members = set(ir.bitmap_bytes(node.bitmap))
    assert members == {ord("a"), ord("b"), ord("c"), ord("x")}


def test_char_class_negation():
    node = parse("[^a]")
    assert isinstance(node, ir.CharClass)
    assert not (node.bitmap >> ord("a")) & 1
    assert (node.bitmap >> ord("b")) & 1
    assert (node.bitmap >> 0x0A) & 1  # negated classes include \n


def test_char_class_leading_bracket_and_dash():
    assert set(ir.bitmap_bytes(parse("[]a]").bitmap)) == {ord("]"), ord("a")}
    assert set(ir.bitmap_bytes(parse("[a-]").bitmap)) == {ord("a"), ord("-")}
    assert set(ir.bitmap_bytes(parse("[-a]").bitmap)) == {ord("a"), ord("-")}


def test_class_escapes():
    assert parse("\\d") == ir.CharClass(ir.DIGIT)
    assert parse("\\w") == ir.CharClass(ir.WORD)
    assert parse("\\S") == ir.CharClass(ir.bitmap_negate(ir.SPACE))
    inner = parse("[\\d_]")
    assert set(ir.bitmap_bytes(inner.bitmap)) == set(
        ir.bitmap_bytes(ir.DIGIT)
    ) | {ord("_")}


def test_anchors_and_word_boundary():
    node = parse("^a$")
    assert node == ir.Cat((ir.Assert("bol"), ir.Lit(b"a"), ir.Assert("eol")))
    assert parse("\\b") == ir.Assert("wb")
    assert parse("\\B") == ir.Assert("nwb")


def test_byte_escapes():
    assert parse("\\n") == ir.Lit(b"\n")
    assert parse("\\x41") == ir.Lit(b"A")
    assert parse("\\.") == ir.Lit(b".")
    assert parse("\\\\") == ir.Lit(b"\\")


def test_single_member_class_becomes_literal():
    assert parse("[a]") == ir.Lit(b"a")
    assert parse("[a-a]") == ir.Lit(b"a")


@pytest.mark.parametrize(
    "bad",
    [
        "*a", "+", "?", "a**", "a{2,1}", "(a", "a)", "[a", "[]", "a\\",
        "\\q", "[z-a]", "^*", "\\b+", "a{1001}",
    ],
)
def test_syntax_errors(bad):
    with pytest.raises(RegexpError):
        parse(bad)


def test_mid_pattern_inline_flag_rejected():
    """(?i) is only supported as a whole-pattern prefix; mid-pattern
    occurrences must raise with a clear message (docs/SEMANTICS.md)."""
    for bad in ("ab(?i)cd", "a|(?i)b", "((?i)a)"):
        with pytest.raises(RegexpError) as ei:
            parse(bad)
        assert "(?i)" in str(ei.value)
    # The prefix form stays accepted.
    parse("(?i)abc")


def test_error_carries_position():
    with pytest.raises(RegexpError) as ei:
        parse("ab(cd")
    assert ei.value.pos >= 2


def test_format_tree_smoke():
    out = ir.format_tree(parse("(foo|[a-z]+)*\\b"))
    assert "Alt" in out and "Rep" in out and "Assert wb" in out
