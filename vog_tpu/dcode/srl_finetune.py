"""Fine-tune the transformers BERT-SRL tagger (dcode stage 1 trainer).

The reference consumed allennlp's released srl-bert fine-tune
(``dcode/srl_tagger.py §tag_sentences_allennlp``); that checkpoint cannot
be downloaded in this image, so this module provides the TRAINER for the
same architecture: BERT with the verb indicator in ``token_type_ids`` and
a linear BIO head, cross-entropy on the first wordpiece of each word
(exactly the convention ``BertSrlTagger._word_tags`` decodes with).

Used two ways:
  * the golden-fixture fidelity harness (tests/test_srl_golden.py,
    VERDICT r3 item #9): fine-tune a tiny BERT on hand-written BIO
    fixtures and assert the full tag -> repair_bio -> frame_from_tags
    path reproduces them EXACTLY;
  * a real fine-tuning entry point for users with SRL data (CoNLL-2012
    style (words, predicate, tags) triples) who want a local checkpoint
    for ``tag_sentences_bert(model_dir=...)``.

CPU torch only — no jax involvement (offline dcode stage).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

from vog_tpu.dcode.srl_tagger import BertSrlTagger

# one training example: (words, predicate index, per-word BIO tags)
Example = Tuple[Sequence[str], int, Sequence[str]]

IGNORE = -100  # wordpiece positions that carry no word label


def _encode(tagger: BertSrlTagger, words: Sequence[str], verb_idx: int, tags=None):
    """Tokenize one frame the exact way ``_word_tags`` does, plus (when
    ``tags`` given) wordpiece-level labels: the FIRST wordpiece of each
    word carries the word's tag id, everything else IGNORE."""
    import torch

    enc = tagger.tokenizer(
        list(words),
        is_split_into_words=True,
        return_tensors="pt",
        truncation=True,
        max_length=tagger.bert.config.max_position_embeddings,
    )
    word_ids = enc.word_ids(0)
    indicator = torch.tensor(
        [[1 if w == verb_idx else 0 for w in word_ids]], dtype=torch.long
    )
    labels = None
    if tags is not None:
        tag_id = {t: i for i, t in enumerate(tagger.tagset)}
        lab = []
        seen = set()
        for w in word_ids:
            if w is None or w in seen:
                lab.append(IGNORE)
            else:
                seen.add(w)
                lab.append(tag_id[tags[w]])
        labels = torch.tensor([lab], dtype=torch.long)
    return enc, indicator, labels


def exact_match(tagger: BertSrlTagger, examples: Sequence[Example]) -> float:
    """Fraction of examples whose decoded per-word tags (incl. the forced
    B-V + repair_bio, i.e. the REAL inference path) equal the gold tags."""
    hit = 0
    for words, v, tags in examples:
        if tagger._word_tags(words, v) == list(tags):
            hit += 1
    return hit / max(len(examples), 1)


def finetune_srl(
    tagger: BertSrlTagger,
    examples: Sequence[Example],
    lr: float = 5e-4,
    max_epochs: int = 200,
    target_exact: float = 1.0,
    seed: int = 0,
    verbose: bool = False,
) -> List[float]:
    """Fine-tune ``tagger`` (BERT + head jointly) on BIO-tagged frames.
    Stops once the decoded exact-match over ``examples`` reaches
    ``target_exact`` (checked each epoch through the real inference
    path).  Returns the per-epoch exact-match trajectory."""
    import torch

    torch.manual_seed(seed)
    for t in tags_missing(tagger, examples):
        raise ValueError(f"gold tag {t!r} not in tagger.tagset")
    params = list(tagger.bert.parameters()) + list(tagger.head.parameters())
    opt = torch.optim.Adam(params, lr=lr)
    encoded = [_encode(tagger, w, v, t) for w, v, t in examples]
    history: List[float] = []
    for epoch in range(max_epochs):
        tagger.bert.train()
        tagger.head.train()
        for (enc, ind, labels) in encoded:
            hid = tagger.bert(
                input_ids=enc["input_ids"],
                attention_mask=enc["attention_mask"],
                token_type_ids=ind,
            ).last_hidden_state
            logits = tagger.head(hid)
            loss = torch.nn.functional.cross_entropy(
                logits.view(-1, logits.shape[-1]),
                labels.view(-1),
                ignore_index=IGNORE,
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
        tagger.bert.eval()
        tagger.head.eval()
        em = exact_match(tagger, examples)
        history.append(em)
        if verbose:
            print(f"epoch {epoch}: exact={em:.3f}", flush=True)
        if em >= target_exact:
            break
    return history


def tags_missing(tagger: BertSrlTagger, examples: Sequence[Example]) -> List[str]:
    known = set(tagger.tagset)
    return sorted({t for _, _, tags in examples for t in tags} - known)


def save_tagger(tagger: BertSrlTagger, out_dir: str) -> str:
    """Write a ``BertSrlTagger.from_pretrained``-loadable directory:
    transformers BERT + tokenizer, ``srl_head.pt``, ``srl_tagset.txt``."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    tagger.bert.save_pretrained(out_dir)
    tagger.tokenizer.save_pretrained(out_dir)
    torch.save(tagger.head.state_dict(), os.path.join(out_dir, "srl_head.pt"))
    with open(os.path.join(out_dir, "srl_tagset.txt"), "w") as f:
        f.write("\n".join(tagger.tagset) + "\n")
    return out_dir
