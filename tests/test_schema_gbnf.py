"""JSON Schema -> GBNF compiler tests (llama.cpp json_schema_to_grammar
analog): the compiled grammar must accept exactly the schema-conforming
JSON texts (checked via the GBNF matcher)."""

import json

import pytest

from wrinklefree_tpu.engine.gbnf import GbnfValidator
from wrinklefree_tpu.engine.schema_to_gbnf import schema_to_gbnf


def accepts(schema, text):
    v = GbnfValidator(schema_to_gbnf(schema))
    r = v.advance(text)
    return r == "complete" or (r == "ok" and v.completable)


class TestPrimitives:
    def test_typed_primitives(self):
        assert accepts({"type": "string"}, '"hi"')
        assert not accepts({"type": "string"}, "42")
        assert accepts({"type": "integer"}, "-7")
        assert not accepts({"type": "integer"}, "1.5")
        assert accepts({"type": "number"}, "1.5e3")
        assert accepts({"type": "boolean"}, "true")
        assert accepts({"type": "null"}, "null")

    def test_enum_and_const(self):
        s = {"enum": ["red", "green", 3]}
        assert accepts(s, '"red"')
        assert accepts(s, "3")
        assert not accepts(s, '"blue"')
        assert accepts({"const": {"a": 1}}, '{"a": 1}')

    def test_anyof(self):
        s = {"anyOf": [{"type": "integer"}, {"type": "null"}]}
        assert accepts(s, "5")
        assert accepts(s, "null")
        assert not accepts(s, '"x"')

    def test_untyped_is_any_json(self):
        assert accepts({}, '{"k": [1, "a", null]}')
        assert accepts({}, "17")


class TestObjects:
    S = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name", "age"],
    }

    def test_required_props_in_order(self):
        assert accepts(self.S, '{"name": "bo", "age": 3}')
        assert not accepts(self.S, '{"age": 3, "name": "bo"}')  # fixed order
        assert not accepts(self.S, '{"name": "bo"}')  # missing required
        assert not accepts(self.S, '{"name": "bo", "age": "x"}')  # type

    def test_optional_props(self):
        s = {
            "type": "object",
            "properties": {
                "a": {"type": "integer"},
                "b": {"type": "boolean"},
            },
            "required": ["a"],
        }
        assert accepts(s, '{"a": 1}')
        assert accepts(s, '{"a": 1, "b": true}')
        assert not accepts(s, '{"b": true}')

    def test_all_optional(self):
        s = {"type": "object",
             "properties": {"x": {"type": "null"}}, "required": []}
        assert accepts(s, "{}")
        assert accepts(s, '{"x": null}')

    def test_nested(self):
        s = {
            "type": "object",
            "properties": {
                "inner": {
                    "type": "object",
                    "properties": {"v": {"type": "number"}},
                    "required": ["v"],
                },
            },
            "required": ["inner"],
        }
        assert accepts(s, '{"inner": {"v": 2.5}}')
        assert not accepts(s, '{"inner": {}}')


class TestArrays:
    def test_items_type(self):
        s = {"type": "array", "items": {"type": "integer"}}
        assert accepts(s, "[]")
        assert accepts(s, "[1, 2, 3]")
        assert not accepts(s, '[1, "a"]')

    def test_min_max_items(self):
        s = {"type": "array", "items": {"type": "integer"},
             "minItems": 2, "maxItems": 3}
        assert not accepts(s, "[1]")
        assert accepts(s, "[1, 2]")
        assert accepts(s, "[1, 2, 3]")
        assert not accepts(s, "[1, 2, 3, 4]")


class TestEndToEnd:
    def test_engine_enforces_schema(self):
        from wrinklefree_tpu.config import BitNetConfig, EngineConfig
        from wrinklefree_tpu.engine import Engine, SamplingParams
        from wrinklefree_tpu.models.bitnet import init_params

        cfg = BitNetConfig.tiny()
        eng = Engine(
            init_params(cfg, seed=0), cfg,
            EngineConfig(max_batch_slots=2, page_size=8, num_pages=64,
                         max_context=64, prefill_buckets=(8, 16, 32)),
        )
        eng.token_pieces = [
            chr(i) if 32 <= i < 127 else "" for i in range(cfg.vocab_size)
        ]
        schema = {
            "type": "object",
            "properties": {"ok": {"type": "boolean"}},
            "required": ["ok"],
        }
        req = eng.generate(
            [1, 5, 9],
            SamplingParams(max_new_tokens=40, ignore_eos=True,
                           grammar=schema_to_gbnf(schema)),
        )
        text = "".join(eng.token_pieces[t] for t in req.output_ids)
        if req.finish_reason == "stop":
            d = json.loads(text)
            assert isinstance(d["ok"], bool)
        else:  # cut by max_tokens: still a valid prefix
            assert GbnfValidator(
                schema_to_gbnf(schema)
            ).advance(text) in ("ok", "complete")
