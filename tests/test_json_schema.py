"""json-schema -> GBNF: generated grammars must accept exactly the schema's
instances (validated through our own GBNF engine)."""
import json

import pytest

from koboldcpp_tpu.grammar.gbnf import GrammarState, parse
from koboldcpp_tpu.grammar.json_schema import json_schema_to_gbnf


def accepts(schema, value) -> bool:
    g = parse(json_schema_to_gbnf(schema))
    st = GrammarState(g)
    nxt = st.advance_bytes(json.dumps(value, separators=(",", ":")).encode())
    return nxt is not None and nxt.allows_eos


def test_primitives():
    assert accepts({"type": "string"}, "hello")
    assert accepts({"type": "integer"}, 42)
    assert not accepts({"type": "integer"}, 4.2)
    assert accepts({"type": "number"}, -3.25)
    assert accepts({"type": "boolean"}, True)
    assert not accepts({"type": "boolean"}, "true x")


def test_object_required_props():
    schema = {"type": "object",
              "properties": {"name": {"type": "string"},
                             "age": {"type": "integer"}},
              "required": ["name", "age"]}
    assert accepts(schema, {"name": "bob", "age": 3})
    assert not accepts(schema, {"name": "bob"})
    assert not accepts(schema, {"age": 3, "name": "bob"})  # fixed order


def test_optional_props():
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
              "required": ["a"]}
    assert accepts(schema, {"a": 1})
    assert accepts(schema, {"a": 1, "b": "x"})
    assert not accepts(schema, {"b": "x"})


def test_enum_and_const():
    assert accepts({"enum": ["red", "green", 3]}, "red")
    assert accepts({"enum": ["red", "green", 3]}, 3)
    assert not accepts({"enum": ["red", "green"]}, "blue")
    assert accepts({"const": "fixed"}, "fixed")
    assert not accepts({"const": "fixed"}, "other")


def test_array_bounds():
    schema = {"type": "array", "items": {"type": "integer"},
              "minItems": 1, "maxItems": 3}
    assert not accepts(schema, [])
    assert accepts(schema, [1])
    assert accepts(schema, [1, 2, 3])
    assert not accepts(schema, [1, 2, 3, 4])
    free = {"type": "array", "items": {"type": "string"}}
    assert accepts(free, [])
    assert accepts(free, ["a", "b"])


def test_anyof_and_ref():
    schema = {
        "$defs": {"pt": {"type": "object",
                         "properties": {"x": {"type": "number"}},
                         "required": ["x"]}},
        "anyOf": [{"$ref": "#/$defs/pt"}, {"type": "null"}],
    }
    assert accepts(schema, {"x": 1.5})
    assert accepts(schema, None)
    assert not accepts(schema, "nope")


def test_tool_call_schema():
    """The OpenAI function-call shape the server forces via grammar."""
    schema = {
        "type": "object",
        "properties": {
            "name": {"const": "get_weather"},
            "arguments": {"type": "object",
                          "properties": {"city": {"type": "string"},
                                         "days": {"type": "integer"}},
                          "required": ["city"]},
        },
        "required": ["name", "arguments"],
    }
    assert accepts(schema, {"name": "get_weather",
                            "arguments": {"city": "Oslo", "days": 3}})
    assert accepts(schema, {"name": "get_weather", "arguments": {"city": "Oslo"}})
    assert not accepts(schema, {"name": "other", "arguments": {"city": "Oslo"}})


def test_tools_grammar_in_dialects():
    from koboldcpp_tpu.server.dialects import transform_genparams

    gp = {"messages": [{"role": "user", "content": "weather?"}],
          "tools": [{"type": "function", "function": {
              "name": "get_weather",
              "parameters": {"type": "object",
                             "properties": {"city": {"type": "string"}},
                             "required": ["city"]}}}]}
    transform_genparams(gp, 4)
    g = parse(gp["grammar"])
    ok = GrammarState(g).advance_bytes(
        b'{"name":"get_weather","arguments":{"city":"Oslo"}}')
    assert ok is not None and ok.allows_eos
    bad = GrammarState(g).advance_bytes(b'{"name":"other"')
    assert bad is None
