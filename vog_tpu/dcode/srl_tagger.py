"""SRL tagging of caption sentences.

Reference parity: the first dcode stage runs an allennlp BERT-SRL model
over every ActivityNet-Captions sentence (SURVEY §3.4).  allennlp is not
in this image, so:

  * ``tag_sentences_allennlp`` is the real path — it imports allennlp at
    call time and raises a clear error when unavailable;
  * ``tag_sentence_rule_based`` is a dependency-free fallback used for
    fixtures and tests: a tiny verb lexicon + template heuristics that
    produce the same output schema (verb index/lemma + role-labelled token
    spans).

Output schema per sentence matches vog_tpu.data.fixtures annotations:
  {"tokens": [...], "verb_idx": int, "verb_lemma": str,
   "args": [{"role": str, "span": [s, e], "lemma": str}, ...]}
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

# minimal verb lexicon: surface form -> lemma (extend for real data)
VERB_LEXICON: Dict[str, str] = {}
for v in (
    "throw", "catch", "ride", "play", "hold", "push", "pull", "watch",
    "run", "jump", "walk", "sit", "stand", "eat", "drink", "open",
    "close", "carry", "kick", "hit", "climb", "swim", "dance", "sing",
):
    VERB_LEXICON[v] = v
    VERB_LEXICON[v + "s"] = v
    VERB_LEXICON[v + "ing"] = v
    VERB_LEXICON[v + "ed"] = v

STOP = {"the", "a", "an", "is", "are", "was", "were", "being", "been"}
LOC_PREPS = {"near", "on", "in", "at", "under", "behind", "beside", "by"}


def tag_sentence_rule_based(tokens: Sequence[str]) -> Optional[Dict]:
    """Heuristic SRL: first lexicon verb = V; noun-ish chunk before it =
    ARG0; chunk after = ARG1; prep-introduced chunk = ARGM-LOC."""
    toks = [t.lower() for t in tokens]
    verb_idx = next((i for i, t in enumerate(toks) if t in VERB_LEXICON), None)
    if verb_idx is None:
        return None
    args = []

    def noun_span(lo: int, hi: int) -> Optional[tuple]:
        content = [i for i in range(lo, hi) if toks[i] not in STOP and toks[i] not in LOC_PREPS]
        if not content:
            return None
        return content[0], content[-1]

    pre = noun_span(0, verb_idx)
    if pre:
        args.append({"role": "ARG0", "span": list(pre), "lemma": toks[pre[1]]})
    loc_start = next(
        (i for i in range(verb_idx + 1, len(toks)) if toks[i] in LOC_PREPS), None
    )
    post_end = loc_start if loc_start is not None else len(toks)
    post = noun_span(verb_idx + 1, post_end)
    if post:
        args.append({"role": "ARG1", "span": list(post), "lemma": toks[post[1]]})
    if loc_start is not None:
        loc = noun_span(loc_start + 1, len(toks))
        if loc:
            args.append({"role": "ARGM-LOC", "span": list(loc), "lemma": toks[loc[1]]})
    return {
        "tokens": list(tokens),
        "verb_idx": verb_idx,
        "verb_lemma": VERB_LEXICON[toks[verb_idx]],
        "args": args,
    }


def tag_sentences_allennlp(sentences: Sequence[str], cuda_device: int = -1) -> List[Dict]:
    """BERT-SRL via allennlp (the reference's tagger). Raises if the
    dependency is absent (it is not baked into this image)."""
    try:
        from allennlp.predictors.predictor import Predictor  # type: ignore
    except ImportError as e:  # pragma: no cover - env without allennlp
        raise ImportError(
            "allennlp is required for BERT-SRL tagging (reference dcode "
            "stage 1). Install allennlp + structured-prediction-srl-bert, "
            "or use tag_sentence_rule_based for fixture-scale data."
        ) from e
    predictor = Predictor.from_path(
        "https://storage.googleapis.com/allennlp-public-models/"
        "structured-prediction-srl-bert.2020.12.15.tar.gz",
        cuda_device=cuda_device,
    )
    out = []
    for s in sentences:
        pred = predictor.predict(sentence=s)
        out.append(_allennlp_to_schema(pred))
    return out


def _allennlp_to_schema(pred: Dict) -> Optional[Dict]:
    """Convert allennlp SRL output (BIO tags per verb) to our schema,
    keeping the first verb frame with arguments."""
    words = pred["words"]
    for frame in pred.get("verbs", []):
        tags = frame["tags"]
        spans: Dict[str, List[int]] = {}
        for i, t in enumerate(tags):
            if t == "O":
                continue
            role = t.split("-", 1)[1]
            spans.setdefault(role, []).append(i)
        if "V" not in spans:
            continue
        verb_idx = spans["V"][0]
        args = [
            {"role": r, "span": [min(ix), max(ix)], "lemma": words[max(ix)].lower()}
            for r, ix in spans.items()
            if r != "V"
        ]
        if args:
            return {
                "tokens": words,
                "verb_idx": verb_idx,
                "verb_lemma": words[verb_idx].lower(),
                "args": args,
            }
    return None
