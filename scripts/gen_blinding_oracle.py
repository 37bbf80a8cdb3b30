import re, json

# Independent replica of the PUBLISHED blinding logic
# (reference eval_graph_vs_raw.py:132-276, 299-310, 421-435) used ONLY to
# derive the q79 oracle constants offline.

OUTCOME = re.compile("|".join([
    r"(?:appeal|petition|writ|application|suit|complaint|reference|review)\s+(?:is|are|was|were|shall\s+be|stands?|be|has\s+been|have\s+been)\s+(?:dismissed|allowed|partly\s+allowed|set\s+aside|remanded|rejected|granted|refused|disposed\s+of|accepted|decreed|negatived|overruled|answered\s+in\s+the\s+(?:affirmative|negative))",
    r"(?:we|court|bench|i)\s+(?:hereby\s+)?(?:dismiss|allow|reject|grant|refuse|set\s+aside|remand|uphold|affirm|reverse|modify|quash|restore|hold\s+that|are\s+of\s+the\s+(?:view|opinion)\s+that)",
    r"(?:in\s+the\s+result|for\s+(?:the\s+)?(?:foregoing|above|aforesaid)\s+reasons?|accordingly|in\s+(?:the\s+)?(?:light|view)\s+of\s+the\s+above|for\s+(?:all\s+)?(?:these|the\s+above)\s+reasons|in\s+conclusion|to\s+sum\s+up|summing\s+up)",
    r"(?:ordered?\s+accordingly|(?:the\s+)?(?:order|decree|judgment|conviction|sentence)\s+(?:is|shall\s+be|stands?)\s+(?:affirmed|reversed|modified|set\s+aside|upheld|restored|quashed|maintained|confirmed))",
    r"(?:appeal|petition|writ|complaint)\s+(?:fails?|succeeds?|is\s+(?:without|with)\s+merit|must\s+(?:fail|succeed)|deserves?\s+to\s+be\s+(?:dismissed|allowed)|is\s+(?:devoid|bereft)\s+of\s+(?:merit|substance))",
    r"(?:no\s+order\s+as\s+to\s+costs?|costs?\s+(?:shall|to)\s+(?:be\s+)?(?:borne|paid)|parties?\s+(?:shall|to|will)\s+bear\s+(?:their\s+)?own\s+costs)",
    r"(?:we|court)\s+(?:see|find|perceive|discern)\s+(?:no\s+)?(?:merit|substance|force|reason\s+to\s+(?:interfere|intervene|disturb))",
    r"(?:conviction|sentence|acquittal)\s+(?:is|shall\s+be|stands?)\s+(?:upheld|confirmed|maintained|set\s+aside|reversed|reduced|modified|altered)",
    r"(?:we\s+answer|(?:the\s+)?question\s+(?:is|are)\s+(?:hereby\s+)?answered)",
    r"(?:held\s*[-:–]|per\s+curiam\s*[-:–]|the\s+court\s+held\s+that)"]), re.I)

DISPOSITIVE = {"dismissed", "allowed", "remanded", "set aside", "disposed of",
    "affirmed", "reversed", "upheld", "quashed", "restored",
    "conviction upheld", "conviction set aside", "acquitted",
    "sentence reduced", "sentence modified", "appeal fails",
    "appeal succeeds", "petition granted", "writ issued",
    "decreed", "negatived"}

HEADNOTE = re.compile(r"^[\s\S]*?(?:HEAD\s*NOTE|HEADNOTE)\s*[-:–\n]", re.I)

REASONING = re.compile(
    r"(?:the\s+court\s+(?:held|found|observed|concluded|noted|opined|was\s+of\s+the\s+view)|"
    r"it\s+was\s+(?:held|found|observed|concluded)\s+(?:that|by)|"
    r"(?:we|this\s+court)\s+(?:hold|find|observe|conclude|are\s+of\s+the\s+(?:view|opinion))\s+that|"
    r"the\s+(?:learned\s+)?(?:judge|magistrate|tribunal|high\s+court|sessions?\s+court)\s+"
    r"(?:held|found|observed|concluded|was\s+(?:right|wrong|justified)|erred)|"
    r"(?:rightly|wrongly|correctly|erroneously)\s+(?:held|found|decided|concluded|dismissed|allowed))", re.I)

FACTLEAK = re.compile(
    r"(?:the\s+court\s+(?:held|found|observed|concluded|noted|opined|directed)|"
    r"it\s+was\s+(?:held|found|observed|concluded)\s+(?:that|by)|"
    r"(?:rightly|wrongly|correctly|erroneously)\s+(?:held|found|decided|concluded)|"
    r"the\s+(?:learned\s+)?(?:judge|magistrate|tribunal|high\s+court)\s+"
    r"(?:held|found|observed|concluded|was\s+(?:right|wrong|justified)|erred)|"
    r"(?:we|this\s+court)\s+(?:hold|find|observe|conclude)\s+that|"
    r"(?:conviction|acquittal|sentence)\s+(?:was|is|has\s+been)\s+"
    r"(?:upheld|set\s+aside|reversed|confirmed|modified)|"
    r"(?:appeal|petition|writ)\s+(?:was|is|has\s+been)\s+"
    r"(?:dismissed|allowed|granted|refused|rejected))", re.I)

SANITY = re.compile(
    r"(?:dismissed|allowed|set\s+aside|remanded|reversed|affirmed|upheld|quashed|"
    r"conviction\s+(?:upheld|set\s+aside)|appeal\s+(?:fails|succeeds)|"
    r"(?:we|court)\s+(?:hold|find|dismiss|allow|reject)\s+that|"
    r"in\s+the\s+result|for\s+the\s+foregoing\s+reasons|ordered?\s+accordingly)", re.I)

SPLIT = re.compile(r"(?<=[.!?])\s+")

def blind_raw_text(text, max_chars=4000):
    if not text:
        return ""
    m = HEADNOTE.search(text[:2000])
    if m:
        text = text[m.end():]
    total = len(text)
    if total < max_chars * 1.5:
        eff = int(total * 0.50)
    elif total < max_chars * 2.0:
        eff = int(total * 0.65)
    else:
        eff = max_chars
    chunk = text[:eff]
    chunk = chunk[:int(len(chunk) * 0.85)]
    out = []
    for sent in SPLIT.split(chunk):
        if OUTCOME.search(sent):
            continue
        lower = sent.lower().strip()
        if any(w in lower for w in DISPOSITIVE) and len(sent) < 150:
            continue
        if REASONING.search(sent):
            continue
        out.append(sent)
    result = " ".join(out).strip()
    lp = result.rfind(".")
    if lp > len(result) * 0.5:
        result = result[:lp + 1]
    return result

def scrub_fact_text(text):
    out = [s for s in SPLIT.split(text) if not FACTLEAK.search(s)]
    result = " ".join(out).strip()
    if not result and text:
        return text[:100] + "..."
    return result

def sanity(text, label, case_id):
    out = []
    for m in SANITY.finditer(text):
        ctx = text[max(0, m.start() - 30):min(len(text), m.end() + 30)].replace("\n", " ")
        out.append(f"  [{case_id}] {label}: ...{ctx}...")
    return out

K1 = "The parties entered into a lease agreement in the year of grace."
K2 = "The property is situated in the northern district of the town."
K3 = "A notice was served on the tenant in the month of March."
K4 = "The rent was paid by cheque on the first day of every month."
D1 = "The appeal is dismissed."
D2 = "The court held that the lease was invalid from inception there."

K5 = "The landlord issued several receipts for the amounts received there."
K6 = "The premises were used for a retail shop during the whole period."
K7 = "Repairs to the roof were carried out at the cost of the tenant."
K8 = "The electricity meter was installed in the name of the original owner."
TAIL = [K2, K3, K4, K5, K6, K7, K8]

VARIANTS = [
    " ".join([K1] + TAIL),
    " ".join([K1, D1] + TAIL),
    " ".join([K1, D2] + TAIL),
    "HEADNOTE: short summary here\n" + " ".join([K1] + TAIL),
]

rows = []
for v, text in enumerate(VARIANTS):
    b = blind_raw_text(text)
    s = scrub_fact_text(text)
    w = sanity(text, "raw", f"k{v}")
    rows.append({"v": v, "blind": b, "scrub": s,
                 "sanity_n": len(w), "sanity_first": w[0] if w else None})
print(json.dumps(rows, indent=1))
