#!/usr/bin/env python3
"""Seeded generator for the DocRED-shaped golden corpus + expected triples.

Writes src/test/resources/docred_corpus.jsonl (200 docs) and
docred_corpus_expected.tsv (title, subj, pred, obj). The expected side is an
independent reimplementation of the reference's entity-vote and gold-triple
semantics (ATLOP+KIRE/data/gen_kg_data.py:272-326):

  - per mention ONE candidate: the in-doc `link` id if present, else the
    resolved single-valued dictionary id of the handleLabel-normalized name;
  - per vertex: Counter vote, most-common wins, ties broken by first
    insertion order (= earliest contributing mention);
  - vertices with no candidate at all: NT{n}, a GLOBAL counter advancing in
    (file order, vertex order);
  - triples: each label (h, t, r) -> (eid_h, r, eid_t), deduplicated.

The dictionary below mirrors graft.kb.Gazetteer's resolvedAliases (prio asc,
qid asc collapse). DocREDSpec's P/R gate fails loudly if either side drifts.
"""
import json
import random
from collections import Counter

OUT_JSONL = "src/test/resources/docred_corpus.jsonl"
OUT_TSV = "src/test/resources/docred_corpus_expected.tsv"

# resolvedAliases mirror: alias -> qid (two-tier collapse already applied)
DICT = {
    "spark": "Q1", "hash": "Q2", "merge": "Q3", "customer": "Q4",
    "vector": "Q5", "window": "Q6", "stream": "Q7", "table": "Q8",
    "query": "Q9", "join": "Q10", "scan": "Q11", "filter": "Q13",
    "sort": "Q14", "batch": "Q15", "column": "Q17", "group": "Q18",
    "hash join": "Q30", "sort merge join": "Q31", "merge join": "Q32",
    "table scan": "Q33", "join order": "Q34",
}

# surface variants that handleLabel-normalize onto a dictionary alias
SURFACES = {
    "Q1": ["spark", "Spark", "SPARK"],
    "Q2": ["hash", "Hash"],
    "Q3": ["merge", "Merge"],
    "Q4": ["customer", "Customer"],
    "Q5": ["vector"], "Q6": ["window"], "Q7": ["stream"],
    "Q8": ["table", "Table"], "Q9": ["query"], "Q10": ["join", "Join"],
    "Q11": ["scan", "Scan"], "Q13": ["filter"], "Q14": ["sort"],
    "Q15": ["batch", "Batch"], "Q17": ["column"], "Q18": ["group", "Group"],
    "Q30": ["hash join", "Hash-Join", "hash-join"],
    "Q31": ["sort merge join", "Sort-Merge-Join"],
    "Q32": ["merge join", "Merge-Join"],
    "Q33": ["table scan", "Table-Scan"],
    "Q34": ["join order", "Join-Order"],
}
UNLINKABLE = ["zorblax", "quuxite", "flurbo", "vexalon", "drimble"]
NER = ["PER", "ORG", "LOC", "TIME", "NUM", "MISC"]
RELATIONS = [
    "P6", "P17", "P19", "P20", "P22", "P25", "P26", "P27", "P30", "P31",
    "P35", "P36", "P37", "P39", "P40", "P50", "P54", "P57", "P58", "P69",
    "P86", "P102", "P108", "P112", "P118", "P123", "P127", "P131", "P136",
    "P137", "P140", "P150", "P155", "P156", "P159", "P161", "P162", "P166",
    "P170", "P171", "P172", "P175", "P176", "P178", "P179", "P190", "P194",
    "P205", "P206", "P241", "P264", "P272", "P276", "P279", "P355", "P361",
    "P364", "P400", "P403", "P449", "P463", "P488", "P495", "P527", "P551",
    "P569", "P570", "P571", "P576", "P577", "P580", "P582", "P585", "P607",
    "P674", "P676", "P706", "P710", "P737", "P740", "P749", "P800", "P807",
    "P840", "P937", "P1001", "P1056", "P1198", "P1336", "P1344", "P1365",
    "P1366", "P1376", "P1412", "P1441", "P3373"]
FILLER = ("the a of in on runs reads feeds powers hosts near with over very "
          "fast slow big small old new last first data line value").split()


def handle_label(s):
    return s.replace("\n", " ").replace(".", "").replace("-", " ").lower()


def gen_doc(rng, title):
    n_vertices = rng.randint(2, 6)
    n_sents = rng.randint(2, 4)
    # choose vertex identities: mostly linkable, ~20% unlinkable
    vertex_plans = []
    for _ in range(n_vertices):
        if rng.random() < 0.2:
            vertex_plans.append(("unlinkable", rng.choice(UNLINKABLE)))
        else:
            vertex_plans.append(("qid", rng.choice(sorted(SURFACES))))
    # mentions per vertex: 1-3, each assigned to a random sentence
    sents_tokens = [[] for _ in range(n_sents)]
    vertex_set = []
    pending = []  # (vertex_idx, mention_name, sent_id, link_or_None, ner)
    for vi, (kind, ident) in enumerate(vertex_plans):
        ner = rng.choice(NER)
        n_ment = rng.randint(1, 3)
        for mi in range(n_ment):
            if kind == "qid":
                name = rng.choice(SURFACES[ident])
                # vote noise: ~10% of mentions of a linkable vertex use a
                # DIFFERENT entity's surface (minority candidate)
                if n_ment >= 2 and mi == n_ment - 1 and rng.random() < 0.3:
                    other = rng.choice(sorted(SURFACES))
                    name = rng.choice(SURFACES[other])
            else:
                name = ident + str(rng.randint(0, 9))
            link = None
            # ~10% explicit link override (always a real qid)
            if rng.random() < 0.1:
                link = rng.choice(sorted(SURFACES))
            pending.append((vi, name, rng.randrange(n_sents), link, ner))
    # lay mentions into sentences with filler between them
    mention_rows = [[] for _ in range(n_vertices)]
    for vi, name, sid, link, ner in pending:
        toks = sents_tokens[sid]
        if toks and rng.random() < 0.8:
            toks.extend(rng.choice(FILLER) for _ in range(rng.randint(1, 3)))
        start = len(toks)
        toks.extend(name.split(" "))
        end = len(toks)
        m = {"name": name, "pos": [start, end], "sent_id": sid, "type": ner}
        if link is not None:
            m["link"] = link
        mention_rows[vi].append(m)
    for toks in sents_tokens:
        if not toks:
            toks.extend([rng.choice(FILLER), rng.choice(FILLER)])
        toks.append(rng.choice(FILLER) + ".")
    # labels over vertex pairs
    labels = []
    seen = set()
    for _ in range(rng.randint(1, 4)):
        h, t = rng.randrange(n_vertices), rng.randrange(n_vertices)
        if h == t or (h, t) in seen:
            continue
        seen.add((h, t))
        labels.append({
            "h": h, "t": t, "r": rng.choice(RELATIONS),
            "evidence": sorted(rng.sample(range(n_sents), rng.randint(1, n_sents)))})
    return {"title": title, "sents": sents_tokens,
            "vertexSet": mention_rows, "labels": labels}


def expected_triples(docs):
    out = []
    seen = set()
    nt = 0
    for doc in docs:
        eids = []
        for vertex in doc["vertexSet"]:
            counts = Counter()
            for m in vertex:
                if "link" in m:
                    cand = m["link"]
                else:
                    cand = DICT.get(handle_label(m["name"]))
                if cand is not None:
                    counts[cand] += 1
            if not counts:
                eids.append("NT%d" % nt)
                nt += 1
            else:
                eids.append(counts.most_common(1)[0][0])
        for lab in doc["labels"]:
            row = (doc["title"], eids[lab["h"]], lab["r"], eids[lab["t"]])
            if row not in seen:
                seen.add(row)
                out.append(row)
    return out


def main():
    rng = random.Random(42)
    docs = [gen_doc(rng, "doc%03d" % i) for i in range(200)]
    with open(OUT_JSONL, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    rows = expected_triples(docs)
    with open(OUT_TSV, "w") as f:
        f.write("title\tsubj\tpred\tobj\n")
        for r in rows:
            f.write("\t".join(r) + "\n")
    n_unlinked = sum(1 for r in rows for x in (r[1], r[3]) if x.startswith("NT"))
    print("docs=%d triples=%d nt_mentions_in_triples=%d" %
          (len(docs), len(rows), n_unlinked))


if __name__ == "__main__":
    main()
