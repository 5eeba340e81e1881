#!/usr/bin/env python3
"""Seeded generator for the DWIE-shaped gate corpus.

DWIE docs (GLRE+KIRE/data_processing/dwieProcess.py:64-70) are DocRED-shaped
plus a per-mention `absolute_pos` [abs_start, abs_end) in document token
space — the field the engine's DWIE scan path consumes. This reuses the
DocRED generator's vertex/mention/label machinery (same dictionary mirror,
vote noise, link overrides) and adds the absolute positions as prefix-sum
offsets over the sentence lengths, exactly the W8 invariant.

Writes src/test/resources/dwie_corpus.jsonl (60 docs, titles DW_###). The
reference-prediction fixtures over it are produced by
`sbt "runMain graft.tools.GenRefPredictions"`.
"""
import json
import random

import gen_docred_corpus as g

OUT_JSONL = "src/test/resources/dwie_corpus.jsonl"


def add_absolute_pos(doc):
    offs = [0]
    for sent in doc["sents"]:
        offs.append(offs[-1] + len(sent))
    for vertex in doc["vertexSet"]:
        for m in vertex:
            base = offs[m["sent_id"]]
            m["absolute_pos"] = [base + m["pos"][0], base + m["pos"][1]]
    return doc


def gen_long_doc(title, n_sents, far_sent):
    """A DWIE-length news article: two MISC vertices (-> P361 decodes under
    the rule table) whose nearest mentions sit `far_sent` sentences apart,
    so min_sent_dist lands on the DWIE-only dis2idx rungs (512->10,
    1024->11, >=2048->12; SSAN+KIRE/dataset.py:89-102) that the 2-4-sentence
    generated docs can never reach."""
    sents = [["data"] for _ in range(n_sents)]
    sents[0] = ["spark"]
    sents[far_sent] = ["hash"]
    vertex_set = [
        [{"name": "spark", "pos": [0, 1], "sent_id": 0, "type": "MISC"}],
        [{"name": "hash", "pos": [0, 1], "sent_id": far_sent, "type": "MISC"}],
    ]
    labels = [{"h": 0, "t": 1, "r": "P361", "evidence": [0]}]
    return {"title": title, "sents": sents, "vertexSet": vertex_set,
            "labels": labels}


# (far_sent, n_sents) per DWIE-only rung: 600->bucket 10, 1100->11, 2150->12
LONG_DOCS = [("DW_L10", 601, 600), ("DW_L11", 1101, 1100),
             ("DW_L12", 2200, 2150)]


def main():
    rng = random.Random(4242)
    docs = [add_absolute_pos(g.gen_doc(rng, "DW_%03d" % i))
            for i in range(60)]
    docs += [add_absolute_pos(gen_long_doc(t, n, f))
             for t, n, f in LONG_DOCS]
    with open(OUT_JSONL, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    n_m = sum(len(v) for d in docs for v in d["vertexSet"])
    n_l = sum(len(d["labels"]) for d in docs)
    print("docs=%d mentions=%d labels=%d" % (len(docs), n_m, n_l))


if __name__ == "__main__":
    main()
