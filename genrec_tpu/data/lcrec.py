"""LCRec SFT sample generation: 6 alignment tasks over semantic-ID tokens.

Parity target: ``/root/reference/genrec/data/amazon_lcrec.py`` — the Alpaca
SFT wrapper (:29-33), task set {seqrec, item2index (title/desc/combined),
index2item (×3), fusionseqrec, itemsearch, preferenceobtain} with per-task
template banks (:42-161), numbered ``<Ci_j>`` history rendering (:456-475),
task sampling weights (:214-221), eval = seqrec only (:432-454).

Template banks here are freshly written phrasings covering the same task
semantics (the reference's banks are 6-17 paraphrases per task; quality
depends on paraphrase diversity, not the exact strings).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from genrec_tpu.configlib import gin
from .sequences import Sample, SequenceCorpus

SFT_PROMPT = (
    "Below is an instruction that describes a task. "
    "Write a response that appropriately completes the request.\n\n"
    "### Instruction:\n{instruction}\n\n### Response:")

HISTORY_SEP = ", "

TEMPLATES: Dict[str, List[str]] = {
    "seqrec": [
        "The user has interacted with these items in order: {history}\n"
        "Which item comes next?",
        "Interaction sequence so far: {history}\nPredict the following item:",
        "Considering the chronological history {history}, name the item the "
        "user will engage with next:",
        "A shopper's past items: {history}\nNext item they will pick:",
        "Sequence: {history}\nContinue the sequence with one item:",
        "From the ordered history {history}, infer the upcoming item:",
        "These purchases happened in order: {history}\nForecast the next one:",
        "Given the browsing trail {history}, what item follows?",
        "Observed item sequence: {history}\nMost likely next item:",
        "With history {history}, produce the next recommendation:",
    ],
    "item2index_title": [
        "An item is titled \"{title}\". Output its index:",
        "Map the product name \"{title}\" to its item index:",
        "Which index belongs to the item called {title}?",
        "Title: {title}\nCorresponding index:",
        "Translate the title \"{title}\" into an item index:",
    ],
    "item2index_desc": [
        "An item is described as: {description}\nGive its index:",
        "Description: {description}\nMatching item index:",
        "Which index fits an item with these details: {description}?",
        "Resolve this description to an index: {description}",
    ],
    "item2index_combined": [
        "Product \"{title}\" with details {description} — output its index:",
        "Title: {title}\nDescription: {description}\nIndex:",
        "Identify the index of \"{title}\" ({description}):",
    ],
    "index2item_title": [
        "Index {index} — state the item's title:",
        "Which product name corresponds to index {index}?",
        "Give the title stored at item index {index}:",
        "Item index {index} refers to the product titled:",
    ],
    "index2item_desc": [
        "Index {index} — describe this item:",
        "Provide the description of the item at index {index}:",
        "What details characterise the item with index {index}?",
    ],
    "index2item_combined": [
        "Index {index} — give the item's title and description:",
        "Report both name and details for item index {index}:",
    ],
    "fusionseqrec": [
        "Ordered history: {history}\nGive the next item's index and title:",
        "After {history}, predict the following item as index plus name:",
        "Sequence {history} continues with which item? Answer with index "
        "and title:",
        "History: {history}\nNext item, stated as its index and its title:",
    ],
    "itemsearch": [
        "A user whose history is {history} searches for \"{query}\". "
        "Return the matching item index:",
        "Query: {query}\nPersonal context: {history}\nBest item index:",
        "Find an item for the request \"{query}\" given past items "
        "{history}:",
        "Considering {history}, answer the search \"{query}\" with an "
        "item index:",
    ],
    "preferenceobtain": [
        "History: {history}\nSummarise what this user likes:",
        "From the items {history}, characterise the user's preferences:",
        "What tastes does the sequence {history} reveal?",
        "Given interactions {history}, write a short preference profile:",
    ],
}

DEFAULT_TASK_WEIGHTS = {
    "seqrec": 1.0, "item2index": 0.5, "index2item": 0.5,
    "fusionseqrec": 0.5, "itemsearch": 0.3, "preferenceobtain": 0.3,
}


def render_history(codes_text: Sequence[str], add_prefix: bool = True) -> str:
    if add_prefix:
        return HISTORY_SEP.join(f"{i + 1}. {c}"
                                for i, c in enumerate(codes_text))
    return HISTORY_SEP.join(codes_text)


@gin.configurable
class LCRecTaskGenerator:
    """Builds (prompt, response) SFT pairs for the 6 LCRec tasks."""

    def __init__(self, corpus: SequenceCorpus, sem_ids: np.ndarray,
                 item_titles: Optional[Sequence[str]] = None,
                 item_descriptions: Optional[Sequence[str]] = None,
                 max_seq_len: int = 20,
                 enabled_tasks: Optional[Sequence[str]] = None,
                 task_sample_weights: Optional[Dict[str, float]] = None,
                 seed: int = 0):
        self.corpus = corpus
        self.sem_ids = np.asarray(sem_ids)
        self.titles = item_titles
        self.descriptions = item_descriptions
        self.max_seq_len = max_seq_len
        self.enabled = set(enabled_tasks or DEFAULT_TASK_WEIGHTS)
        self.weights = dict(task_sample_weights or DEFAULT_TASK_WEIGHTS)
        self.rng = np.random.default_rng(seed)

    def _code_text(self, item: int) -> str:
        return "".join(f"<C{i}_{int(c)}>"
                       for i, c in enumerate(self.sem_ids[item]))

    def _title(self, item: int) -> str:
        if self.titles is not None and item < len(self.titles):
            return str(self.titles[item]) or f"item {item}"
        return f"item {item}"

    def _desc(self, item: int) -> str:
        if self.descriptions is not None and item < len(self.descriptions):
            return str(self.descriptions[item]) or f"a product ({item})"
        return f"a product in category {item % 31}"

    def _history_text(self, history: Sequence[int]) -> str:
        hist = list(history)[-self.max_seq_len:]
        return render_history([self._code_text(i) for i in hist])

    def _pick(self, bank: str) -> str:
        t = TEMPLATES[bank]
        return t[int(self.rng.integers(0, len(t)))]

    def make_pair(self, task: str, sample: Sample,
                  subtype: str | None = None) -> tuple[str, str]:
        """``subtype`` forces the title/desc/combined variant for the
        item2index / index2item tasks (eval enumerates all three, reference
        amazon_lcrec.py:393-429); ``None`` samples one (train behavior)."""
        target = sample.target
        if task == "seqrec":
            instr = self._pick("seqrec").format(
                history=self._history_text(sample.history))
            resp = self._code_text(target)
        elif task == "item2index":
            sub = subtype or self.rng.choice(["title", "desc", "combined"])
            instr = self._pick(f"item2index_{sub}").format(
                title=self._title(target), description=self._desc(target))
            resp = self._code_text(target)
        elif task == "index2item":
            sub = subtype or self.rng.choice(["title", "desc", "combined"])
            instr = self._pick(f"index2item_{sub}").format(
                index=self._code_text(target))
            if sub == "title":
                resp = self._title(target)
            elif sub == "desc":
                resp = self._desc(target)
            else:
                resp = f"{self._title(target)} - {self._desc(target)}"
        elif task == "fusionseqrec":
            instr = self._pick("fusionseqrec").format(
                history=self._history_text(sample.history))
            resp = f"{self._code_text(target)} {self._title(target)}"
        elif task == "itemsearch":
            instr = self._pick("itemsearch").format(
                history=self._history_text(sample.history),
                query=self._title(target))
            resp = self._code_text(target)
        elif task == "preferenceobtain":
            instr = self._pick("preferenceobtain").format(
                history=self._history_text(sample.history))
            titles = [self._title(i) for i in sample.history[-3:]]
            resp = "items similar to " + ", ".join(titles)
        else:
            raise ValueError(f"Unknown task: {task!r}")
        return SFT_PROMPT.format(instruction=instr), resp

    def generate(self, split: str, max_samples: int = 0) -> List[dict]:
        """Task-mixed SFT samples; eval splits are seqrec-only (ref :432-454)."""
        base = self.corpus.generate_samples(split)
        out = []
        tasks = sorted(self.enabled & set(DEFAULT_TASK_WEIGHTS))
        probs = np.asarray([self.weights.get(t, 0.0) for t in tasks])
        probs = probs / probs.sum()
        for s in base:
            if split == "train":
                task = str(self.rng.choice(tasks, p=probs))
            else:
                task = "seqrec"
            prompt, resp = self.make_pair(task, s)
            out.append({"task": task, "prompt": prompt, "response": resp,
                        "target": s.target,
                        "target_sem_ids": self.sem_ids[s.target].tolist()})
            if max_samples and len(out) >= max_samples:
                break
        return out

    def generate_item_eval(self, task: str, max_items: int = 0,
                           subtypes: Sequence[str] = ("title", "desc",
                                                      "combined")
                           ) -> List[dict]:
        """Per-item eval samples for the grounding tasks.

        The reference enumerates the catalog once per subtype for
        item2index / index2item (``amazon_lcrec.py:393-429``); its eval
        loop then scores whichever tasks the loader carries
        (``trainers/lcrec_trainer.py:192-239``). ``max_items`` caps the
        catalog sweep (eval cost control); 0 = all items."""
        if task not in ("item2index", "index2item"):
            raise ValueError(f"not an item-enumeration task: {task!r}")
        n = self.corpus.num_items or len(self.sem_ids)
        if max_items:
            n = min(n, max_items)
        out = []
        for item in range(n):
            for sub in subtypes:
                prompt, resp = self.make_pair(
                    task, Sample(user_id=0, history=[], target=item),
                    subtype=sub)
                out.append({"task": task, "subtype": sub, "prompt": prompt,
                            "response": resp, "target": item,
                            "target_sem_ids": self.sem_ids[item].tolist()})
        return out
