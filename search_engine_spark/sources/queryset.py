"""The frozen reference query set (FIXTURES.md §3).

Coverage: single terms (head / tail / absent / stopword-only), implicit AND
(query.cpp:642-646), explicit & | -, quoted phrases, nesting, phrase+term
mixes (modeled on query/tests/client.cpp:19-46), synonym-bearing terms,
title-only matches, punctuation, escapes.
"""

QUERIES: list[tuple[int, str]] = [
    (1, "search"),
    (2, "scores"),                      # head inflected form
    (3, "atlas"),
    (4, "w0"),                          # opaque head id
    (5, "w19999"),                      # deep tail id (likely absent)
    (6, "zzzznotaword"),                # absent term
    (7, "the"),                         # stopword-only → empty plan
    (8, "the of and"),                  # all stopwords
    (9, "search engine"),               # implicit AND
    (10, "index documents"),
    (11, "search & engine"),            # explicit AND
    (12, "search | engine"),            # OR
    (13, "search - engine"),            # AND NOT
    (14, "search engine - crawler"),
    (15, '"search engine"'),            # phrase
    (16, '"index the documents"'),      # phrase with inner stopword
    (17, '"w0 w1"'),
    (18, "search & (engine | crawler)"),
    (19, "(search | index) & (engine | documents)"),
    (20, "search & engine | crawler"),  # left-fold precedence
    (21, '"search engine" ranking'),    # phrase + term mix
    (22, "- search"),                   # bare NOT
    (23, "running"),                    # stemmed form matches run
    (24, "connection"),                 # synonym-bearing
    (25, "universities"),               # irregular-ish inflection
    (26, "children"),                   # exception word
    (27, "fastest biggest"),            # phase6 er/est forms
    (28, "word. punct,"),               # trailing punctuation in query
    (29, "SEARCH Engine"),              # case-insensitivity
    (30, "search  engine   index"),     # extra whitespace
    (31, "w1 & w2 & w3"),               # multi AND
    (32, "w1 | w2 | w3"),               # multi OR
    (33, 'documents "index documents"'),
    (34, "engine - (crawler | parser)"),
    (35, "happiness"),
    (36, "government decisions"),
    (37, '"big data"'),
    (38, "a an the is are"),            # stopword soup
    (39, "apple | apples"),             # same stem both sides
    (40, "mercilessly"),
]

QUERY_STRINGS = [q for _, q in QUERIES]
