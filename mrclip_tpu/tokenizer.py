"""CLIP byte-level BPE tokenizer, NumPy-native (no torch).

Capability parity with reference `src/open_clip/tokenizer.py` (SimpleTokenizer
:133-265, clean fns :66-130, reduction strategies :280-400, HFTokenizer
:403-461). Token ids are bit-identical to the reference for the shipped
`bpe_simple_vocab_16e6.txt.gz` vocabulary (49408 entries, `<start_of_text>` /
`<end_of_text>` specials). Output is an int32 ndarray `[n, context_length]`
ready to feed a jitted text tower; MR-CLIP's default context length is 98.
"""

from __future__ import annotations

import gzip
import html
import os
import string
from functools import lru_cache
from typing import Callable, List, Optional, Union

import numpy as np

try:
    import ftfy

    _HAS_FTFY = True
except Exception:  # pragma: no cover - ftfy is normally available
    _HAS_FTFY = False

try:
    import regex as re
except Exception:  # pragma: no cover
    import re  # type: ignore

from .constants import DEFAULT_CONTEXT_LENGTH

__all__ = [
    "SimpleTokenizer",
    "HFTokenizer",
    "SigLipTokenizer",
    "tokenize",
    "decode",
    "DEFAULT_CONTEXT_LENGTH",
]


@lru_cache()
def default_bpe_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets", "bpe_simple_vocab_16e6.txt.gz")


@lru_cache()
def _byte_unicode_table() -> dict:
    """Reversible byte -> printable-unicode mapping used by the GPT-2/CLIP BPE.

    Printable ASCII and Latin-1 ranges map to themselves; the remaining bytes
    map to codepoints starting at 256 so no token ever contains whitespace or
    control characters.
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    mapping = {b: chr(b) for b in keep}
    fill = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + fill)
            fill += 1
    return mapping


def _adjacent_pairs(symbols) -> set:
    return set(zip(symbols[:-1], symbols[1:]))


# ---------------------------------------------------------------------------
# Text cleaning (reference tokenizer.py:66-130)
# ---------------------------------------------------------------------------

def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return " ".join(text.split()).strip()


def canonicalize_text(
    text: str,
    *,
    keep_punctuation_exact_string: Optional[str] = None,
    trans_punctuation: dict = str.maketrans("", "", string.punctuation),
) -> str:
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(trans_punctuation) for part in text.split(keep_punctuation_exact_string)
        )
    else:
        text = text.translate(trans_punctuation)
    text = text.lower()
    return " ".join(text.split()).strip()


def get_clean_fn(kind: str) -> Callable[[str], str]:
    if kind == "canonicalize":
        return lambda x: canonicalize_text(basic_clean(x))
    if kind == "lower":
        return lambda x: whitespace_clean(basic_clean(x)).lower()
    if kind == "whitespace":
        return lambda x: whitespace_clean(basic_clean(x))
    raise ValueError(f"Invalid clean function ({kind}).")


# ---------------------------------------------------------------------------
# Core tokenizer
# ---------------------------------------------------------------------------

class SimpleTokenizer:
    """Byte-level BPE tokenizer with CLIP vocab; emits int32 numpy arrays."""

    def __init__(
        self,
        bpe_path: Optional[str] = None,
        additional_special_tokens: Optional[List[str]] = None,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "lower",
        reduction_mask: str = "",
    ):
        bpe_path = bpe_path or default_bpe_path()
        self.byte_encoder = _byte_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(bpe_path) as f:
            lines = f.read().decode("utf-8").split("\n")
        # Skip the header line; keep exactly enough merges for a 49152-256-2
        # merge table (reference tokenizer.py:144-145).
        merges = [tuple(line.split()) for line in lines[1 : 49152 - 256 - 2 + 1]]

        base = list(self.byte_encoder.values())
        vocab: List[str] = base + [tok + "</w>" for tok in base]
        vocab.extend("".join(m) for m in merges)
        specials = ["<start_of_text>", "<end_of_text>"]
        if additional_special_tokens:
            specials = specials + list(additional_special_tokens)
        vocab.extend(specials)

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.merge_rank = {m: i for i, m in enumerate(merges)}
        self._bpe_cache = {tok: tok for tok in specials}
        self.pat = re.compile(
            "|".join(specials) + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

        self.vocab_size = len(self.encoder)
        self.all_special_ids = [self.encoder[t] for t in specials]
        self.sot_token_id = self.all_special_ids[0]
        self.eot_token_id = self.all_special_ids[1]
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.reduction_fn = get_reduction_mask_fn(reduction_mask) if reduction_mask else None

    # -- BPE ---------------------------------------------------------------

    def bpe(self, token: str) -> str:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _adjacent_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            best = min(pairs, key=lambda p: self.merge_rank.get(p, float("inf")))
            if best not in self.merge_rank:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    merged.extend(word[i:])
                    break
                merged.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
            if len(word) == 1:
                break
            pairs = _adjacent_pairs(word)

        out = " ".join(word)
        self._bpe_cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = self.clean_fn(text)
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self.bpe(token).split(" "))
        return ids

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )

    # -- batching ----------------------------------------------------------

    def __call__(self, texts: Union[str, List[str]], context_length: Optional[int] = None) -> np.ndarray:
        """Tokenize into a zero-padded `[n, context_length]` int32 array.

        Overlong inputs are truncated with the final position forced to EOT
        (reference tokenizer.py:255-262).
        """
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "Please set a valid context length"

        if self.reduction_fn is not None:
            return self.reduction_fn(
                texts,
                context_length=context_length,
                sot_token_id=self.sot_token_id,
                eot_token_id=self.eot_token_id,
                encode_fn=self.encode,
            )

        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [self.sot_token_id] + self.encode(text) + [self.eot_token_id]
            if len(tokens) > context_length:
                tokens = tokens[:context_length]
                tokens[-1] = self.eot_token_id
            result[i, : len(tokens)] = tokens
        return result


_default_tokenizer: Optional[SimpleTokenizer] = None


def _get_default() -> SimpleTokenizer:
    global _default_tokenizer
    if _default_tokenizer is None:
        _default_tokenizer = SimpleTokenizer()
    return _default_tokenizer


def tokenize(texts: Union[str, List[str]], context_length: int = DEFAULT_CONTEXT_LENGTH) -> np.ndarray:
    return _get_default()(texts, context_length=context_length)


def decode(tokens) -> str:
    return _get_default().decode(tokens)


# ---------------------------------------------------------------------------
# Context-overflow reduction strategies (reference tokenizer.py:280-400)
# ---------------------------------------------------------------------------

def _pad_row(result: np.ndarray, i: int, tokens: List[int]) -> None:
    result[i, : len(tokens)] = tokens


def random_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
    shuffle: bool = False,
) -> np.ndarray:
    """Keep a random subset of tokens when the caption overflows the context."""
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = np.asarray(encode_fn(text))
        num_tokens = len(tokens)
        budget = context_length - 2  # room for sot/eot
        if num_tokens > budget:
            keep = np.random.permutation(num_tokens)[:budget]
            if not shuffle:
                keep = np.sort(keep)
            tokens = tokens[keep]
        _pad_row(result, i, [sot_token_id] + tokens.tolist() + [eot_token_id])
    return result


def simple_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
) -> np.ndarray:
    """Keep a random contiguous block of tokens on overflow."""
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = encode_fn(text)
        budget = context_length - 2
        if len(tokens) > budget:
            start = np.random.randint(0, len(tokens) - budget + 1)
            tokens = tokens[start : start + budget]
        _pad_row(result, i, [sot_token_id] + tokens + [eot_token_id])
    return result


def syntax_mask_tokenize(
    texts: List[str],
    context_length: int,
    sot_token_id: int,
    eot_token_id: int,
    encode_fn: Callable,
) -> np.ndarray:
    """Prioritize nouns > adjectives > verbs when dropping words on overflow."""
    import nltk

    def _ensure(resource, name):
        try:
            nltk.data.find(resource)
        except LookupError:  # pragma: no cover - needs network
            nltk.download(name)

    _ensure("tokenizers/punkt", "punkt")
    _ensure("taggers/averaged_perceptron_tagger", "averaged_perceptron_tagger")

    def order_key(tag: str) -> int:
        if tag.startswith("NN"):
            return 1
        if tag.startswith("JJ"):
            return 2
        if tag.startswith("VB"):
            return 3
        return 4

    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        words = nltk.tokenize.word_tokenize(text)
        pos = nltk.pos_tag(words)
        prio = np.array([order_key(t) for _, t in pos])
        order = np.argsort(prio, kind="stable")[: context_length - 2]
        kept = np.array(words)[np.sort(order)]
        tokens = encode_fn(" ".join(kept))[: context_length - 2]
        _pad_row(result, i, [sot_token_id] + tokens + [eot_token_id])
    return result


def get_reduction_mask_fn(kind: str) -> Callable:
    if kind == "simple":
        return simple_mask_tokenize
    if kind == "random":
        return random_mask_tokenize
    if kind == "shuffle":
        from functools import partial

        return partial(random_mask_tokenize, shuffle=True)
    if kind == "syntax":
        return syntax_mask_tokenize
    raise ValueError(f"Unknown reduction mask type ({kind}).")


# ---------------------------------------------------------------------------
# HuggingFace tokenizer adapter (reference tokenizer.py:403-461)
# ---------------------------------------------------------------------------

class HFTokenizer:
    """HuggingFace AutoTokenizer wrapper emitting fixed-length int32 arrays."""

    def __init__(
        self,
        tokenizer_name: str,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "whitespace",
        strip_sep_token: bool = False,
        language: Optional[str] = None,
        cache_dir: Optional[str] = None,
        **kwargs,
    ):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name, cache_dir=cache_dir, **kwargs)
        set_lang_fn = getattr(self.tokenizer, "set_src_lang_special_tokens", None)
        if callable(set_lang_fn):
            self.set_lang_fn = set_lang_fn
        if language is not None:
            self.set_language(language)
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.strip_sep_token = strip_sep_token

    def save_pretrained(self, dest):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts: Union[str, List[str]], context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "Please set a valid context length in class init or call."

        texts = [self.clean_fn(t) for t in texts]
        out = self.tokenizer.batch_encode_plus(
            texts,
            return_tensors="np",
            max_length=context_length,
            padding="max_length",
            truncation=True,
        ).input_ids
        if self.strip_sep_token:
            out = np.where(out == self.tokenizer.sep_token_id, np.zeros_like(out), out)
        return out.astype(np.int32)

    def set_language(self, src_lang):
        if hasattr(self, "set_lang_fn"):
            self.set_lang_fn(src_lang)
        else:
            import warnings

            warnings.warn("Cannot set language for the tokenizer.")


class SigLipTokenizer(HFTokenizer):
    """HF T5/sentencepiece tokenizer with SigLIP's canonicalization
    (reference tokenizer.py:464-521): lowercase, punctuation stripped,
    pad-to-max with EOS."""

    VOCAB_FILES = {
        "c4-en": "T5 c4-en sentencepiece (via hf-hub t5-base)",
        "mc4": "T5 mc4 multilingual sentencepiece (via hf-hub google/mt5-base)",
    }

    def __init__(self, tokenizer_name: str, context_length: Optional[int] = 64):
        name = {"c4-en": "t5-base", "mc4": "google/mt5-base"}.get(tokenizer_name, tokenizer_name)
        super().__init__(name, context_length=context_length, clean="canonicalize")
