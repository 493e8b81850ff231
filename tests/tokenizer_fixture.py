"""Tiny real HF fast tokenizer built in-process (no network) for tests."""
from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
from transformers import PreTrainedTokenizerFast

WORDS = (
    "the quick brown fox jumps over lazy dog cat sat on mat tpu chips "
    "interconnect high bandwidth links quantum computing superconducting "
    "qubits recipe chocolate cake cocoa zebra giraffe elephant safari "
    "document number about topic query passage instruct retrieve relevant "
    "question answer a an and of in to is was"
).split()


def make_tiny_tokenizer(lowercase: bool = False,
                        add_bos: bool = False) -> PreTrainedTokenizerFast:
    """``add_bos=True`` mimics Llama-style tokenizers that prepend bos under
    add_special_tokens=True (the blocked-query / EmbeddingBag bos contract)."""
    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3}
    for w in WORDS:
        if w not in vocab:
            vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    if lowercase:
        tok.normalizer = normalizers.Lowercase()
    if add_bos:
        from tokenizers import processors

        tok.post_processor = processors.TemplateProcessing(
            single="<bos> $A", pair="<bos> $A $B",
            special_tokens=[("<bos>", vocab["<bos>"])],
        )
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>", bos_token="<bos>", eos_token="<eos>", unk_token="<unk>",
    )
