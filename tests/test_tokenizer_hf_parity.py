"""Tokenizer parity fuzz test vs the installed HF BertTokenizer(Fast).

The reference's whole text plane runs through HF
`BertTokenizerFast.batch_encode_plus(texts, max_length=L,
pad_to_max_length=True)` (`/root/reference/src/datasets/
dataset_pretrain.py:123`, `src/pretrain/run_pretrain.py:75`); our
`data/tokenization.py` is a from-scratch reimplementation. A silent
divergence here degrades R@1 on real data in a way no model test can
catch, so this test cross-checks `input_ids` / `attention_mask` /
`special_tokens_mask` against BOTH HF implementations (fast = the one the
reference runs, slow = the google-research original) on a realistic
wordpiece vocab and ~200 adversarial strings: NFD accents, CJK, emoji,
contractions, >100-char words, control/zero-width chars, fullwidth forms,
unicode punctuation, literal special tokens, empty/whitespace-only input.
"""

import itertools

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from clipbert_tpu.data.tokenization import BertTokenizer  # noqa: E402

MAX_LEN = 20


def _realistic_vocab():
    """Real wordpiece structure: specials + unused slots + whole words +
    ## continuations + single chars (latin, digits, punct, CJK)."""
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += [f"[unused{i}]" for i in range(6)]
    toks += list("abcdefghijklmnopqrstuvwxyz")
    toks += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    toks += list("0123456789") + ["##" + d for d in "0123456789"]
    toks += list(".,?!'\"-()[]{}@#%&*/\\:;<>=+_~`|^$")
    toks += ["“", "”", "’", "—"]   # unicode quotes/dash
    toks += ["the", "a", "an", "cat", "dog", "man", "video", "person",
             "run", "walk", "play", "don", "doesn", "it", "is", "was",
             "cafe", "naive", "hello", "world", "new", "york"]
    toks += ["##ing", "##ning", "##s", "##ed", "##er", "##est", "##ly",
             "##tion", "##t", "##re", "##ve", "##ll"]
    toks += ["你", "好", "世", "界", "中", "文"]
    return list(dict.fromkeys(toks))


def _corpus():
    hand = [
        "",                       # empty
        " ",                      # whitespace only
        "\t\n\r  ",
        "the cat runs",
        "a dog playing in new york",
        "café",                   # NFC accent
        "café",             # NFD accent (combining acute)
        "naïve",
        "NAÏVE CAFÉ",
        "don't",
        "DON'T!",
        "doesn’t",           # unicode apostrophe
        "it's the dog's toy",
        "你好世界",                # CJK run
        "中文 and english mixed 世界",
        "龍鳳",                    # CJK not in vocab -> UNK per char
        "hello​world",       # zero-width space (Cf control, removed)
        "null\x00byte",
        "bell\x07char",
        "tab\tsep\nnewline",
        "x" * 150,                # >100-char word -> UNK
        "a" + "b" * 120 + "c",
        "!!!???...",
        "--==++~~",
        "(hello) [world] {cat}",
        "“quoted” — dash",
        "3.14159 is pi",
        "$100 & 99%",
        "e=mc2",
        "hi👋 there",             # emoji glues to the word -> UNK
        "🎥🎬",
        "[MASK] the cat",         # literal special tokens in text
        "a [SEP] b [CLS] c",
        "[PAD][UNK]",
        "[mask] lowercase special",
        "ｆｕｌｌｗｉｄｔｈ",        # fullwidth latin
        "½ + ¼ = ¾",
        "ｃａｔ ｄｏｇ",
        "running walked plays",   # wordpiece continuations
        "unrunnable",             # partial-piece word
        "a.b.c.d",
        "U.S.A.",
        "co-operate re-run",
        "ÅΩ units",               # uppercase accents / greek
        "straße",                 # sharp s (lowercases to itself in py)
        "İstanbul",               # dotted capital I (expands under lower())
        "ʼn",                      # NFKC-expanding char
        " leading and trailing  ",
        "multiple   internal    spaces",
        "mixed123numbers456and789words",
        "слово",                  # cyrillic, not in vocab
        "かたかな",                # kana (NOT in the CJK ideograph ranges)
    ]
    # combinatorial tail to reach ~200: word x punct x accent fragments
    words = ["cat", "café", "don't", "running", "你好", "hi👋", "x" * 30]
    puncts = ["", "!", "...", " — ", "’s"]
    pre = ["", "the ", "[MASK] ", "ｆｗ "]
    combos = [f"{p}{w}{q}" for p, w, q in
              itertools.product(pre, words, puncts)]
    return hand + combos


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(_realistic_vocab()) + "\n", encoding="utf-8")
    return str(p)


@pytest.fixture(scope="module")
def ours(vocab_file):
    return BertTokenizer(vocab_file)


def _hf_encode(hf, texts):
    enc = hf.batch_encode_plus(
        texts, max_length=MAX_LEN, padding="max_length", truncation=True,
        return_special_tokens_mask=True, return_tensors="np")
    return (np.asarray(enc["input_ids"]),
            np.asarray(enc["attention_mask"]),
            np.asarray(enc["special_tokens_mask"]))


@pytest.mark.parametrize("flavor", ["fast", "slow"])
def test_batch_encode_matches_hf(ours, vocab_file, flavor):
    if flavor == "fast":
        hf = transformers.BertTokenizerFast(vocab_file=vocab_file,
                                            do_lower_case=True)
    else:
        hf = transformers.BertTokenizer(vocab_file=vocab_file,
                                        do_lower_case=True)
    texts = _corpus()
    assert len(texts) >= 190
    got = ours.batch_encode(texts, MAX_LEN)
    want_ids, want_mask, want_special = _hf_encode(hf, texts)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(
            got["input_ids"][i], want_ids[i],
            err_msg=f"[{flavor}] input_ids diverge on {t!r}: "
                    f"ours={ours.convert_ids_to_tokens(got['input_ids'][i])} "
                    f"hf={hf.convert_ids_to_tokens(list(want_ids[i]))}")
        np.testing.assert_array_equal(
            got["attention_mask"][i], want_mask[i],
            err_msg=f"[{flavor}] attention_mask diverges on {t!r}")
        np.testing.assert_array_equal(
            got["special_tokens_mask"][i], want_special[i],
            err_msg=f"[{flavor}] special_tokens_mask diverges on {t!r}")


def test_real_bert_vocab_spotcheck(ours, vocab_file):
    """tokenize() (token strings, not just ids) matches HF slow tokenizer
    token-for-token on the fuzz corpus — catches id-collision luck."""
    hf = transformers.BertTokenizer(vocab_file=vocab_file,
                                    do_lower_case=True)
    for t in _corpus():
        assert ours.tokenize(t) == hf.tokenize(t), repr(t)
