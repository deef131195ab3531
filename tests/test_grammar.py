"""GBNF grammar engine tests: parsing, string acceptance, token filtering."""
import numpy as np
import pytest

from koboldcpp_tpu.grammar.gbnf import GrammarState, TokenFilter, parse


def accepts(g, s: str) -> bool:
    st = GrammarState(g)
    nxt = st.advance_bytes(s.encode())
    return nxt is not None and nxt.allows_eos


def test_literal():
    g = parse('root ::= "hello"')
    assert accepts(g, "hello")
    assert not accepts(g, "hell")
    assert not accepts(g, "helloo")


def test_alternates():
    g = parse('root ::= "yes" | "no"')
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")


def test_char_class_and_star():
    g = parse('root ::= [a-z]+')
    assert accepts(g, "abc")
    assert not accepts(g, "aBc")
    assert not accepts(g, "")
    g2 = parse('root ::= [a-z]*')
    assert accepts(g2, "")
    assert accepts(g2, "xyz")


def test_negated_class():
    g = parse('root ::= [^0-9]+')
    assert accepts(g, "ab!")
    assert not accepts(g, "a1")


def test_rule_refs_and_recursion():
    g = parse('''
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+
''')
    assert accepts(g, "1")
    assert accepts(g, "12+3+456")
    assert not accepts(g, "12+")
    assert not accepts(g, "+1")


def test_optional_and_bounded_repeat():
    g = parse('root ::= "a"? "b"{2,3}')
    assert accepts(g, "bb")
    assert accepts(g, "abbb")
    assert not accepts(g, "b")
    assert not accepts(g, "abbbb")


def test_groups():
    g = parse('root ::= ("ab" | "cd")+')
    assert accepts(g, "ab")
    assert accepts(g, "abcdab")
    assert not accepts(g, "ac")


def test_json_like_grammar():
    g = parse(r'''
root ::= object
object ::= "{" ws ( member ( "," ws member )* )? "}" ws
member ::= string ":" ws value
value ::= object | array | string | number | "true" | "false" | "null"
array ::= "[" ws ( value ( "," ws value )* )? "]" ws
string ::= "\"" [^"\\]* "\"" ws
number ::= "-"? [0-9]+ ws
ws ::= [ \t\n]*
''')
    assert accepts(g, '{}')
    assert accepts(g, '{"a":1,"b":{"c":true}}')
    assert not accepts(g, '{"a":}')
    assert not accepts(g, '{')


def test_unicode_classes():
    g = parse('root ::= [\\u00e0-\\u00ff]+')
    assert accepts(g, "àéî")
    assert not accepts(g, "abc")


def test_token_filter_with_spm_vocab():
    from .test_tokenizer import make_spm_vocab
    from koboldcpp_tpu.tokenizers import Tokenizer

    tok = Tokenizer(make_spm_vocab())
    tf = TokenFilter('root ::= " hello"+', tok)
    m = tf.mask()
    v = tok.vocab
    hid = v.token_to_id["▁hello"]
    assert m[hid]           # "▁hello" decodes to " hello"
    assert not m[v.token_to_id["▁world"]]
    assert not m[v.eos_id]  # eos not yet allowed
    tf.accept(hid)
    m2 = tf.mask()
    assert m2[hid]
    assert m2[v.eos_id]     # one repetition done -> eos legal


def test_token_filter_byte_fallback_partial_utf8():
    from .test_tokenizer import make_spm_vocab
    from koboldcpp_tpu.tokenizers import Tokenizer

    tok = Tokenizer(make_spm_vocab())
    v = tok.vocab
    tf = TokenFilter('root ::= "é"', tok)  # C3 A9 in UTF-8
    m = tf.mask()
    b1, b2 = v.byte_tokens[0xC3], v.byte_tokens[0xA9]
    assert m[b1]
    assert not m[v.byte_tokens[0xC2]]
    tf.accept(b1)
    m2 = tf.mask()
    assert m2[b2]
    tf.accept(b2)
    assert tf.state.allows_eos


def test_left_recursion_raises():
    g = parse('root ::= root "a" | "b"')
    with pytest.raises(RecursionError):
        GrammarState(g)
