"""Recipes must stay REAL: every flag in every recipe script parses against
the CLI's dataclass parsers, and every referenced file exists."""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECIPES = os.path.join(REPO, "recipes")

_PARSERS = {
    "train_ctc": lambda: _parser("train_ctc"),
    "train_aed": lambda: _parser("train_aed"),
    "train_tokenizer": lambda: _parser("train_tokenizer"),
    "pretrain": lambda: _parser("pretrain"),
    "evaluate": lambda: _parser("evaluate"),
    "train_clm": lambda: _parser("train_clm"),
}


def _parser(which):
    from huggingface_asr_tpu.data.datasets import DataConfig
    from huggingface_asr_tpu.training.arguments import (
        GeneralTrainingArguments,
        GenerationArguments,
        ModelArguments,
    )
    from huggingface_asr_tpu.utils.argparsing import DataclassArgumentParser

    if which == "train_tokenizer":
        from huggingface_asr_tpu.cli.train_tokenizer import TokenizerTrainingArguments

        return DataclassArgumentParser([TokenizerTrainingArguments, DataConfig])
    if which == "pretrain":
        from huggingface_asr_tpu.training.arguments import PretrainingArguments

        return DataclassArgumentParser(
            [PretrainingArguments, ModelArguments, GeneralTrainingArguments, DataConfig]
        )
    if which == "evaluate":
        from huggingface_asr_tpu.cli.evaluate import EvalArguments

        return DataclassArgumentParser(
            [EvalArguments, ModelArguments, GenerationArguments, DataConfig]
        )
    if which == "train_clm":
        from huggingface_asr_tpu.cli.train_clm import CLMArguments

        return DataclassArgumentParser([CLMArguments, GeneralTrainingArguments, DataConfig])
    return DataclassArgumentParser(
        [ModelArguments, GeneralTrainingArguments, GenerationArguments, DataConfig]
    )


def _extract_invocations(script_text):
    """Yield (cli_module, [args]) for each python -m huggingface_asr_tpu.cli.X
    invocation, with line continuations joined and $VARS substituted."""
    text = script_text.replace("\\\n", " ")
    for m in re.finditer(r"python -m huggingface_asr_tpu\.cli\.(\w+)\s+(.*)", text):
        module, rest = m.group(1), m.group(2)
        rest = re.sub(r"\"?\$\{?\w+\}?[^\s\"]*\"?", "DUMMY", rest)
        args = []
        for tok in rest.split():
            tok = tok.strip('"')
            if tok.startswith("#"):
                break
            args.append(tok)
        yield module, args


def _recipe_scripts():
    for root, _, files in os.walk(RECIPES):
        for f in files:
            if f.endswith(".sh"):
                yield os.path.join(root, f)


@pytest.mark.parametrize("script", sorted(_recipe_scripts()),
                         ids=lambda p: os.path.relpath(p, RECIPES))
def test_recipe_args_parse(script):
    text = open(script).read()
    invocations = list(_extract_invocations(text))
    assert invocations, f"{script} contains no CLI invocation"
    for module, args in invocations:
        parser = _PARSERS[module]()
        # parse_args_into_dataclasses raises on unknown/malformed flags
        parser.parse_args_into_dataclasses(args)


@pytest.mark.parametrize("script", sorted(_recipe_scripts()),
                         ids=lambda p: os.path.relpath(p, RECIPES))
def test_recipe_referenced_repo_files_exist(script):
    # scan only non-comment lines (comments cite reference-repo anchors)
    text = "\n".join(
        l for l in open(script).read().splitlines() if not l.lstrip().startswith("#")
    )
    for rel in re.findall(r"(?:recipes|configs)/[\w./-]+", text):
        assert os.path.exists(os.path.join(REPO, rel)), f"{script} references missing {rel}"
