"""GBNF grammar parser + incremental matcher + engine constrained
decoding (llama-server `grammar` field; reference's BitNet.cpp backend
surface — SURVEY.md §0)."""

import pytest

from wrinklefree_tpu.engine.gbnf import GbnfError, GbnfValidator, parse_gbnf


def status(grammar, text):
    return GbnfValidator(grammar).advance(text)


class TestParser:
    def test_basic_rules(self):
        rules = parse_gbnf('root ::= "yes" | "no"')
        assert len(rules["root"]) == 2

    def test_undefined_rule(self):
        with pytest.raises(GbnfError, match="undefined"):
            parse_gbnf('root ::= foo')

    def test_no_root(self):
        with pytest.raises(GbnfError, match="root"):
            parse_gbnf('a ::= "x"')

    def test_comments_and_multiline(self):
        rules = parse_gbnf(
            '# header\nroot ::= a b  # trailing\na ::= "x"\nb ::= "y"\n'
        )
        assert set(rules) >= {"root", "a", "b"}

    def test_escapes(self):
        assert status(r'root ::= "a\nb"', "a\nb") == "complete"
        assert status(r'root ::= "\x41B"', "AB") == "complete"

    def test_bad_syntax_line_number(self):
        with pytest.raises(GbnfError, match="line 2"):
            parse_gbnf('root ::= "x"\nbad  "y"')


class TestMatcher:
    def test_literal_alternates(self):
        g = 'root ::= "yes" | "no"'
        assert status(g, "yes") == "complete"
        assert status(g, "no") == "complete"
        assert status(g, "y") == "ok"
        assert status(g, "maybe") == "dead"

    def test_char_class_and_ranges(self):
        g = "root ::= [a-cx]"
        for ch in "abcx":
            assert status(g, ch) == "complete"
        assert status(g, "d") == "dead"

    def test_negated_class(self):
        g = 'root ::= [^0-9]'
        assert status(g, "q") == "complete"
        assert status(g, "5") == "dead"

    def test_star_plus_question(self):
        g = 'root ::= "a"* "b"'
        assert status(g, "b") == "complete"
        assert status(g, "aaab") == "complete"
        assert status(g, "aab") == "complete"
        assert status(g, "c") == "dead"
        g2 = 'root ::= "a"+ "b"'
        assert status(g2, "b") == "dead"
        assert status(g2, "ab") == "complete"
        g3 = 'root ::= "a"? "b"'
        assert status(g3, "ab") == "complete"
        assert status(g3, "aab") == "dead"

    def test_bounded_repetition(self):
        g = 'root ::= "a"{2,3}'
        assert status(g, "a") == "ok"
        assert status(g, "aa") in ("ok", "complete")  # completable, extendable
        v = GbnfValidator(g)
        assert v.advance("aa") == "ok"
        assert v.completable
        assert v.advance("a") == "complete"
        assert status(g, "aaaa") == "dead"

    def test_groups_and_nesting(self):
        g = 'root ::= ("ab" | "cd")+ "!"'
        assert status(g, "abcdab!") == "complete"
        assert status(g, "ab!") == "complete"
        assert status(g, "a!") == "dead"

    def test_rule_references(self):
        g = '''
root ::= greeting " " name
greeting ::= "hi" | "yo"
name ::= [A-Z] [a-z]+
'''
        v = GbnfValidator(g)
        assert v.advance("hi Bob") == "ok"  # name is extendable ([a-z]+)
        assert v.completable
        v2 = GbnfValidator(g)
        assert v2.advance("yo Al") == "ok"
        assert v2.completable
        assert status(g, "hi bob") == "dead"

    def test_unbounded_match_is_completable_not_complete(self):
        """[0-9]+ must not stop at the first digit (shortest-match bug)."""
        g = "root ::= [0-9]+"
        v = GbnfValidator(g)
        assert v.advance("1") == "ok"  # extendable
        assert v.completable  # but EOS is legal here
        assert v.advance("23") == "ok"
        assert v.completable

    def test_clone_independent(self):
        v = GbnfValidator('root ::= "ab"')
        v.advance("a")
        c = v.clone()
        assert c.advance("b") == "complete"
        assert v.advance("b") == "complete"

    def test_empty_string_grammar(self):
        v = GbnfValidator('root ::= "x"?')
        assert v.completable  # empty input already matches


class TestEngineGrammar:
    @pytest.fixture(scope="class")
    def setup(self):
        from wrinklefree_tpu.config import BitNetConfig, EngineConfig
        from wrinklefree_tpu.engine import Engine
        from wrinklefree_tpu.models.bitnet import init_params

        cfg = BitNetConfig.tiny()
        params = init_params(cfg, seed=0)
        ecfg = EngineConfig(
            max_batch_slots=4, page_size=8, num_pages=64, max_context=64,
            prefill_buckets=(8, 16, 32),
        )
        eng = Engine(params, cfg, ecfg, eos_token_id=0)
        eng.token_pieces = [
            chr(i) if 32 <= i < 127 else "" for i in range(cfg.vocab_size)
        ]
        return eng

    def test_grammar_forces_output(self, setup):
        from wrinklefree_tpu.engine import SamplingParams

        eng = setup
        req = eng.generate(
            [1, 5, 9],
            SamplingParams(max_new_tokens=8, ignore_eos=True,
                           grammar='root ::= "yes" | "no"'),
        )
        text = "".join(eng.token_pieces[t] for t in req.output_ids)
        assert text in ("yes", "no")
        assert req.finish_reason == "stop"

    def test_grammar_digits(self, setup):
        from wrinklefree_tpu.engine import SamplingParams

        eng = setup
        req = eng.generate(
            [2, 6], SamplingParams(max_new_tokens=6, ignore_eos=True,
                                   grammar="root ::= [0-9]{2,4}"),
        )
        text = "".join(eng.token_pieces[t] for t in req.output_ids)
        assert text.isdigit() and 2 <= len(text) <= 4

    def test_bad_grammar_rejected_at_submit(self, setup):
        from wrinklefree_tpu.engine import SamplingParams

        with pytest.raises(ValueError):
            setup.submit([1, 2], SamplingParams(grammar="root := broken"))


class TestBlowupSafety:
    """A grammar that explodes the possible-stacks set mid-generation
    must finish the request, never wedge the engine (review finding:
    GbnfError was uncaught in the decode loop)."""

    # distinguishable suffixes ("b" vs "c" tails) double the stack set
    # per consumed char — stack dedup can't collapse them
    AMBIG = 'root ::= "a" root "b" | "a" root "c" | "a"'

    def test_validator_raises_on_explosion(self):
        v = GbnfValidator(self.AMBIG)
        with pytest.raises(GbnfError):
            for _ in range(40):
                assert v.advance("a") != "dead"

    def test_engine_survives_ambiguous_grammar(self):
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
        bad = eng.submit(
            [1, 2, 3],
            SamplingParams(max_new_tokens=60, ignore_eos=True,
                           grammar=self.AMBIG),
        )
        good = eng.submit(
            [4, 5, 6], SamplingParams(max_new_tokens=6, ignore_eos=True)
        )
        for _ in range(300):
            if bad.finished and good.finished:
                break
            eng.step()
        assert bad.finished  # ended cleanly, not wedged
        assert good.finished and len(good.output_ids) == 6
