"""Word list driving stemmer golden generation + parity tests.

Covers: the 42-word stoplist, the 33 irregular-plural exceptions, every
suffix rule of every phase (0,1a,1b,1b-del,1c,2,3,4,5,6), trailing
punctuation, <3-char passthrough, apostrophes, y-marking, and a broad set
of ordinary English inflections (see reference stemmer.cpp phases).
"""

STOPWORDS = [
    "the", "a", "an", "and", "or", "but", "if", "with", "by", "on", "for",
    "in", "of", "to", "at", "is", "are", "was", "were", "be", "been",
    "being", "as", "it", "its", "this", "that", "these", "those", "he",
    "she", "they", "them", "his", "her", "their", "you", "your", "we",
    "our", "i", "me", "my",
]

EXCEPTION_WORDS = [
    "children", "women", "men", "news", "data", "media", "analysis",
    "series", "species", "money", "information", "person", "people",
    "teeth", "geese", "feet", "mice", "indices", "matrices", "oxen",
    "dice", "knives", "leaves", "wives", "lives", "thieves", "wolves",
    "potatoes", "tomatoes", "heroes", "echoes", "buses", "polite",
]

PHASE_WORDS = [
    # phase0: apostrophe suffixes
    "dogs'", "dog's", "dogs's'", "o'neill's", "'twas", "'em",
    # phase1a: sses / ied / ies / ws / us / ss / s
    "glasses", "masses", "classes", "tied", "cried", "ties", "cries",
    "ponies", "flies", "died", "lies", "news", "views", "cows", "bonus",
    "virus", "census", "miss", "grass", "chess", "gas", "this", "gaps",
    "kiwis", "cats", "runs", "atlas", "bias",
    # phase1b: eed / eedly / ed / edly / ing / ingly (+ phase1b_del)
    "agreed", "agreedly", "feed", "freed", "speed", "succeed", "proceed",
    "walked", "walkedly", "plastered", "bled", "hopped", "hoped", "hoping",
    "hopping", "luxuriated", "luxuriating", "disabled", "matting",
    "mating", "meeting", "meetings", "milling", "messing", "sized",
    "falling", "filing", "failing", "running", "stopped", "fitted",
    "egged", "added", "offed", "tanned", "inferred", "tripping",
    "singing", "bring", "string", "sing", "thing", "dating", "voting",
    # phase1c: y/Y -> i
    "cry", "by", "say", "happy", "sky", "enjoy", "identify", "fly",
    "party", "body", "study", "early", "only",
    # phase2
    "rational", "national", "conditional", "relational", "valenci",
    "hesitanci", "amiabli", "confidentli", "digitizer", "organization",
    "colonization", "operational", "sensational", "activation",
    "demonstration", "operator", "generator", "feudalism", "formaliti",
    "vitaliti", "radicalli", "formalli", "usefulness", "hopefulness",
    "analogousli", "famousli", "callousness", "effectiveness",
    "decisiveness", "sensitiviti", "productiviti", "sensibiliti",
    "responsibiliti", "possibli", "terribli", "analogi", "biologi",
    "theologi", "beautifulli", "carelessli", "harmlessli", "quickli",
    "badli", "fluentli", "cheerfulli", "really", "slowly",
    # phase3
    "proportional", "duplicate", "complicate", "authenticiti",
    "electriciti", "identical", "practical", "hopeful", "useful",
    "goodness", "darkness", "formative", "decorative", "informative",
    "triplicate", "educational", "rationalize", "nationalize",
    # phase4
    "revival", "allowance", "inference", "airliner", "gyroscopic",
    "adjustable", "defensible", "irritant", "replacement", "adjustment",
    "dependent", "adoption", "communism", "activate", "angulariti",
    "homologous", "effective", "bowdlerize", "legalize", "modernize",
    "criticize", "recognize", "maximize", "minimize", "authorize",
    "decision", "admission", "suspension", "station", "nation",
    "attention", "detention",
    # phase5
    "probate", "rate", "cease", "controll", "roll", "skill", "install",
    "large", "late", "athlete", "concrete", "create", "debate",
    # phase6: er / est
    "faster", "fastest", "bigger", "biggest", "smaller", "smallest",
    "computer", "container", "writer", "reader", "greatest", "latest",
    "honest", "forest", "interest", "west", "best", "nearest",
    # <3 chars passthrough
    "ab", "x", "go", "up", "ok", "no",
    # trailing punctuation
    "word.", "word,", "word;", "word:", "word!", "word?", 'word"',
    "word)", "word]", "word}", "word'", "running.", "cats,",
    "systems!?", "done...", "(paren",
    # y-marking edge cases
    "yearly", "yes", "youth", "crying", "dying", "saying", "playing",
    "yoyo", "syzygy", "rhythm", "gray", "grey", "key", "keys",
    # misc real words / general inflections
    "connection", "connections", "connected", "connecting", "connects",
    "argument", "arguments", "argued", "arguing", "argues",
    "generalization", "generalizations", "oscillators", "presumably",
    "universities", "university", "abilities", "ability", "animals",
    "animal", "apples", "apple", "engineering", "engineered", "engineers",
    "distributed", "distribution", "distributing", "distributes",
    "searches", "searched", "searching", "search", "indexes", "indexing",
    "indexed", "queries", "queried", "querying", "documents", "document",
    "documented", "documentation", "ranking", "ranked", "ranks",
    "scores", "scored", "scoring", "parser", "parsers", "parsing",
    "parsed", "tokens", "tokenized", "tokenizer", "stemming", "stemmer",
    "crawler", "crawled", "crawling", "postings", "posting", "posted",
    "retrieval", "retrieved", "retrieving", "relevance", "relevant",
    "frequencies", "frequency", "probabilities", "probability",
    "happiness", "happier", "happiest", "merciful", "mercilessly",
    "knowledge", "acknowledgment", "government", "governments",
    "governed", "governing", "believes", "believed", "believing",
    "belief", "beliefs", "past", "pasted", "pasting", "paste",
    "exceed", "exceeded", "exceeding", "agreement", "disagreement",
    "ize", "size", "sizes", "prize", "prizes", "realize", "realized",
    # opaque ids like the reference's own generators (index_test/test3.cpp)
    "word0", "word1", "word42", "term17", "doc99",
]

STEM_TEST_WORDS = STOPWORDS + EXCEPTION_WORDS + PHASE_WORDS
