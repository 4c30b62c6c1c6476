/* se_native: C fast path for the extraction hot loop.
 *
 * Implements the SAME semantics as the pure-Python reference-parity
 * modules (search_engine_spark/functions/htmlparse.py + tokenize.py +
 * the per-doc aggregation in operators/extract.py), which are themselves
 * golden-verified byte-identical to the compiled reference parser
 * (/root/reference/engine/parser/HtmlParser.cpp).  The Python modules
 * remain the source of truth and the differential arbiter
 * (tests/test_native_parity.py, tools/fuzz_parity.py --native): this file
 * must produce IDENTICAL output or it is a bug here.
 *
 * Design notes:
 * - one C call per document (parse + stem + per-doc posting aggregation)
 *   so the Python interpreter is off the per-byte and per-token paths;
 * - stemming stays in Python (functions/stemmer.py): a C-side hash table
 *   caches token-bytes -> stem-bytes, calling the Python stemmer ONCE per
 *   distinct token per process (Zipf makes the miss rate negligible) —
 *   no second stemmer implementation to drift;
 * - all parsing is byte-oriented over an ASCII-lowercased copy, exactly
 *   like the reference (HtmlParser.cpp:23-30,311).
 */

#define _GNU_SOURCE   /* memmem */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* ---------------- growable byte / struct buffers ---------------- */

typedef struct { char *p; Py_ssize_t len, cap; } Buf;

static int buf_reserve(Buf *b, Py_ssize_t extra) {
    if (b->len + extra <= b->cap) return 0;
    Py_ssize_t ncap = b->cap ? b->cap * 2 : 256;
    while (ncap < b->len + extra) ncap *= 2;
    char *np = PyMem_Realloc(b->p, ncap);
    if (!np) return -1;
    b->p = np; b->cap = ncap;
    return 0;
}
static int buf_put(Buf *b, const char *src, Py_ssize_t n) {
    if (buf_reserve(b, n) < 0) return -1;
    memcpy(b->p + b->len, src, n);
    b->len += n;
    return 0;
}
static void buf_free(Buf *b) { PyMem_Free(b->p); b->p = NULL; b->len = b->cap = 0; }

typedef struct { Py_ssize_t off, len; int flag; } Span;
typedef struct { Span *p; Py_ssize_t len, cap; } Spans;

static int spans_push(Spans *s, Py_ssize_t off, Py_ssize_t len, int flag) {
    if (s->len == s->cap) {
        Py_ssize_t ncap = s->cap ? s->cap * 2 : 64;
        Span *np = PyMem_Realloc(s->p, ncap * sizeof(Span));
        if (!np) return -1;
        s->p = np; s->cap = ncap;
    }
    s->p[s->len].off = off; s->p[s->len].len = len; s->p[s->len].flag = flag;
    s->len++;
    return 0;
}
static void spans_free(Spans *s) { PyMem_Free(s->p); s->p = NULL; s->len = s->cap = 0; }

/* ---------------- tag table (HtmlTags.h:46-202) ---------------- */

enum { ORDINARY, TITLE, COMMENT, DISCARD, DISCARD_SECTION, ANCHOR, BASE_T,
       EMBED_T, HTML_TAG };

#define LONGEST_TAG_LENGTH 20

static const char *DISCARD_TAGS[] = {
    "!doctype","abbr","acronym","address","applet","area","article","aside",
    "audio","b","basefont","bdi","bdo","bgsound","big","blink","blockquote",
    "body","br","button","canvas","caption","center","cite","code","col",
    "colgroup","content","data","datalist","dd","del","details","dfn",
    "dialog","dir","div","dl","dt","em","fieldset","figcaption","figure",
    "font","footer","form","frame","frameset","h1","h2","h3","h4","h5","h6",
    "head","header","hgroup","hr","i","iframe","img","input","ins","isindex",
    "kbd","keygen","label","legend","li","link","listing","main","map",
    "mark","marquee","menu","menuitem","meta","meter","nav","nobr",
    "noframes","noscript","object","ol","optgroup","option","output","p",
    "param","picture","plaintext","pre","progress","q","rp","rt","rtc",
    "ruby","s","samp","section","select","shadow","slot","small","source",
    "spacer","span","strike","strong","sub","summary","sup","table","tbody",
    "td","template","textarea","tfoot","th","thead","time","tr","track",
    "tt","u","ul","var","video","wbr","xmp", NULL
};

/* tiny static hash set for tag lookup: open addressing, FNV-1a */
#define TAGTAB_SIZE 512
static struct { const char *name; int action; } tag_tab[TAGTAB_SIZE];

static uint32_t fnv1a(const char *s, Py_ssize_t n) {
    uint32_t h = 2166136261u;
    for (Py_ssize_t i = 0; i < n; i++) { h ^= (uint8_t)s[i]; h *= 16777619u; }
    return h;
}
static void tag_insert(const char *name, int action) {
    uint32_t h = fnv1a(name, (Py_ssize_t)strlen(name)) & (TAGTAB_SIZE - 1);
    while (tag_tab[h].name) h = (h + 1) & (TAGTAB_SIZE - 1);
    tag_tab[h].name = name; tag_tab[h].action = action;
}
static void tag_tab_init(void) {
    for (int i = 0; DISCARD_TAGS[i]; i++) tag_insert(DISCARD_TAGS[i], DISCARD);
    tag_insert("!--", COMMENT);      tag_insert("a", ANCHOR);
    tag_insert("base", BASE_T);      tag_insert("embed", EMBED_T);
    tag_insert("html", HTML_TAG);    tag_insert("title", TITLE);
    tag_insert("script", DISCARD_SECTION);
    tag_insert("style", DISCARD_SECTION);
    tag_insert("svg", DISCARD_SECTION);
}
/* HtmlTags.cpp:33-61: exact match; >20 chars -> OrdinaryText; miss -> Discard */
static int lookup_tag(const char *name, Py_ssize_t n) {
    if (n > LONGEST_TAG_LENGTH) return ORDINARY;
    uint32_t h = fnv1a(name, n) & (TAGTAB_SIZE - 1);
    while (tag_tab[h].name) {
        if ((Py_ssize_t)strlen(tag_tab[h].name) == n
            && memcmp(tag_tab[h].name, name, n) == 0)
            return tag_tab[h].action;
        h = (h + 1) & (TAGTAB_SIZE - 1);
    }
    return DISCARD;
}

static inline int is_ws(uint8_t c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

/* ---------------- parser state ---------------- */

typedef struct {
    const char *d;        /* lowercased buffer */
    Py_ssize_t L;
    Spans body;           /* raw body words (off,len,flag) */
    Spans title;          /* raw title words */
    Spans links;          /* href spans */
    int english;
    int in_title, in_anchor, in_discard, in_heading, in_bold;
    int have_link;        /* current_link truthy */
    const char *discarding; /* "script"/"style"/"svg" literal */
    int oom;
} P;

static inline uint8_t at(P *p, Py_ssize_t i) {
    return (i >= 0 && i < p->L) ? (uint8_t)p->d[i] : 0;
}
static inline int flags_of(P *p) {
    return (p->in_bold ? 1 : 0) | (p->in_heading ? 2 : 0);
}

static void emit_word(P *p, Py_ssize_t off, Py_ssize_t len) {
    /* anchor-text lists are parser state only (never in the extraction
       output), so links' word lists are not materialized */
    if (p->in_title) {
        if (spans_push(&p->title, off, len, 0) < 0) p->oom = 1;
    } else {
        if (spans_push(&p->body, off, len, flags_of(p)) < 0) p->oom = 1;
    }
}

/* ParseText: HtmlParser.cpp:243-277 */
static Py_ssize_t parse_text(P *p, Py_ssize_t i) {
    const char *d = p->d; Py_ssize_t L = p->L;
    Py_ssize_t start = i;
    while (i < L && d[i] != '<') {
        if (is_ws((uint8_t)d[i])) {
            if (start != i) emit_word(p, start, i - start);
            i++;
            while (i < L && is_ws((uint8_t)d[i])) i++;
            start = i;
        } else i++;
    }
    if (start != i) emit_word(p, start, i - start);
    return i;
}

static Py_ssize_t find_sub(const char *d, Py_ssize_t L, Py_ssize_t from,
                           const char *pat, Py_ssize_t n) {
    if (from < 0) from = 0;
    if (n == 0 || from + n > L) return -1;
    const char *hit = memmem(d + from, (size_t)(L - from), pat, (size_t)n);
    return hit ? (Py_ssize_t)(hit - d) : -1;
}

/* extract_attribute: HtmlParser.cpp:44-55 over d[from:to) */
static int extract_attr(const char *d, Py_ssize_t from, Py_ssize_t to,
                        const char *key, Py_ssize_t klen,
                        Py_ssize_t *voff, Py_ssize_t *vlen) {
    if (to <= from) return 0;
    Py_ssize_t s = find_sub(d, to, from, key, klen);
    if (s < 0) return 0;
    s += klen;
    Py_ssize_t e = find_sub(d, to, s, "\"", 1);
    if (e < 0) return 0;
    *voff = s; *vlen = e - s;
    return 1;
}

static Py_ssize_t handle_ordinary(P *p, Py_ssize_t i, Py_ssize_t start);

/* ParseTag: HtmlParser.cpp:68-241.  Returns next index, or -2 to end the
   parse (embed with no '>'), or advances; -1 never returned. */
static Py_ssize_t parse_tag(P *p, Py_ssize_t i) {
    const char *d = p->d; Py_ssize_t L = p->L;
    i += 1;
    while (i < L && is_ws((uint8_t)d[i])) i++;
    Py_ssize_t start = i;
    while (i < L && !is_ws((uint8_t)d[i]) && d[i] != '>') i++;
    Py_ssize_t toff = start, tlen = i - start;
    int is_closing = (tlen > 0 && d[toff] == '/');
    if (is_closing) { toff++; tlen--; }
    if (tlen > 0 && d[toff + tlen - 1] == '/') tlen--;

    int action = lookup_tag(d + toff, tlen);

    /* style state set BEFORE the closing-tag early return (cpp:89-103) */
    if (tlen == 1 && d[toff] == 'b') p->in_bold = 1;
    else if (tlen == 2 && d[toff] == 'h' && d[toff+1] >= '1' && d[toff+1] <= '6')
        p->in_heading = 1;

    if (is_closing && action != ORDINARY) {
        while (i < L && d[i] != '>') i++;
        if (at(p, i) == '>') i++;
        return i;
    }

    if (action == DISCARD_SECTION) {
        p->discarding = (tlen == 6 && memcmp(d+toff, "script", 6) == 0) ? "script"
                      : (tlen == 5 && memcmp(d+toff, "style", 5) == 0) ? "style"
                      : (tlen == 3 && memcmp(d+toff, "svg", 3) == 0) ? "svg" : "";
        p->in_discard = 1;
    } else if (action == COMMENT) {
        while (i < L && !(at(p, i) == '-' && at(p, i+1) == '-' && at(p, i+2) == '>'))
            i++;
        if (i < L) i += 3;
        return i;
    } else if (action == TITLE) {
        p->in_title = 1;
    } else if (action == ANCHOR) {
        Py_ssize_t tag_end = i;
        int in_quotes = 0;
        while (tag_end < L) {
            char c = d[tag_end];
            if (c == '"') in_quotes = !in_quotes;
            else if (c == '>' && !in_quotes) break;
            tag_end++;
        }
        if (at(p, tag_end) == '>') {
            /* FindHrefAttribute, cpp:57-66 */
            Py_ssize_t j = find_sub(d, L, i, "h", 1);
            Py_ssize_t href_pos = -1;
            while (j >= 0 && j < tag_end) {
                if (j + 6 <= L && memcmp(d + j, "href=\"", 6) == 0) {
                    href_pos = j + 6; break;
                }
                j = find_sub(d, L, j + 1, "h", 1);
            }
            if (href_pos >= 0) {
                Py_ssize_t eq = find_sub(d, L, href_pos, "\"", 1);
                if (eq >= 0 && eq < tag_end && eq > href_pos) {
                    if (spans_push(&p->links, href_pos, eq - href_pos, 0) < 0)
                        p->oom = 1;
                    p->have_link = 1;
                    p->in_anchor = 1;
                }
            }
        }
        i = tag_end;
    } else if (action == BASE_T) {
        /* base href collected in the Python port but unused by extraction;
           consume identically (no output effect) */
    } else if (action == EMBED_T) {
        Py_ssize_t end = find_sub(d, L, i, ">", 1);
        if (end < 0) return -2;              /* ptr = nullptr (cpp:158-160) */
        Py_ssize_t voff, vlen;
        if (extract_attr(d, i, end, "src=\"", 5, &voff, &vlen) && vlen > 0) {
            if (spans_push(&p->links, voff, vlen, 0) < 0) p->oom = 1;
        }
    } else if (action == ORDINARY) {
        return handle_ordinary(p, i, start);
    } else if (action == HTML_TAG) {
        while (i < L && d[i] != '>') {
            if (i + 6 <= L && memcmp(d + i, "lang=\"", 6) == 0) {
                p->english = (at(p, i+6) == 'e' && at(p, i+7) == 'n');
                i += 8;
                break;
            }
            i++;
        }
    }

    while (i < L && d[i] != '>') i++;
    if (at(p, i) == '>') i++;
    return i;
}

/* broken-HTML salvage, cpp:166-222 */
static Py_ssize_t handle_ordinary(P *p, Py_ssize_t i, Py_ssize_t start) {
    const char *d = p->d; Py_ssize_t L = p->L;
    Py_ssize_t tag_start = start - 1;
    Py_ssize_t next_lt = find_sub(d, L, i, "<", 1);
    Py_ssize_t next_gt = find_sub(d, L, i, ">", 1);

    if (next_gt < 0 || (next_lt >= 0 && next_lt < next_gt)) {
        /* unclosed tag: maybe merge with the preceding word */
        Py_ssize_t bound = 2 * i - L;     /* ptr - strlen(ptr), cpp:179 */
        Py_ssize_t lb = tag_start - 1;
        while (lb >= bound && lb >= 0 && !is_ws((uint8_t)d[lb]) && d[lb] != '<')
            lb--;
        lb++;
        Py_ssize_t coff, clen;
        if (p->body.len > 0 && lb < tag_start) {
            coff = lb; clen = i - lb;
            p->body.len--;                 /* words.pop() */
        } else {
            coff = tag_start; clen = i - tag_start;
        }
        /* anchor-text list mutation is state-only; skipped (see emit_word) */
        if (p->in_title) {
            if (spans_push(&p->title, coff, clen, 0) < 0) p->oom = 1;
        } else {
            if (spans_push(&p->body, coff, clen, flags_of(p)) < 0) p->oom = 1;
        }
        return parse_text(p, i);
    } else {
        /* tag text up to '>' re-emitted as words (NOT into anchor text);
           the Python port uses bytes.split() here, whose whitespace set
           additionally has \v and \f — match it exactly */
        #define is_split_ws(c) (is_ws(c) || (c) == '\v' || (c) == '\f')
        Py_ssize_t j = tag_start, end = next_gt + 1;
        while (j < end) {
            while (j < end && is_split_ws((uint8_t)d[j])) j++;
            Py_ssize_t ws = j;
            while (j < end && !is_split_ws((uint8_t)d[j])) j++;
            if (j > ws) {
                if (p->in_title) {
                    if (spans_push(&p->title, ws, j - ws, 0) < 0) p->oom = 1;
                } else {
                    if (spans_push(&p->body, ws, j - ws, flags_of(p)) < 0)
                        p->oom = 1;
                }
            }
        }
        return end;
    }
}

static Py_ssize_t skip_past_gt(P *p, Py_ssize_t i) {
    Py_ssize_t j = find_sub(p->d, p->L, i, ">", 1);
    return j < 0 ? -2 : j + 1;
}

/* FindFirstClosingTag, cpp:279-307 */
static Py_ssize_t find_first_closing(P *p, Py_ssize_t i) {
    const char *d = p->d; Py_ssize_t L = p->L;
    Py_ssize_t j = find_sub(d, L, i, "<", 1);
    while (j >= 0) {
        if (j + 9 <= L && memcmp(d + j, "</script>", 9) == 0
            && strcmp(p->discarding, "script") == 0) return j + 9;
        if (j + 8 <= L && memcmp(d + j, "</style>", 8) == 0
            && strcmp(p->discarding, "style") == 0) return j + 8;
        if (j + 6 <= L && memcmp(d + j, "</svg>", 6) == 0
            && strcmp(p->discarding, "svg") == 0) return j + 6;
        j = find_sub(d, L, j + 1, "<", 1);
    }
    return -2;
}

/* main loop: HtmlParser.cpp:309-368 */
static void run_parser(P *p) {
    const char *d = p->d; Py_ssize_t L = p->L;
    Py_ssize_t i = 0;
    while (i >= 0 && i < L && !p->oom) {
        if (d[i] == '<') {
            uint8_t nxt = at(p, i + 1);
            if (nxt == '/' && p->in_title && i + 7 <= L
                && memcmp(d + i + 2, "title", 5) == 0) {
                p->in_title = 0;
                i = skip_past_gt(p, i);
            } else if (nxt == '/' && p->in_anchor && at(p, i+2) == 'a') {
                p->in_anchor = 0;
                i = skip_past_gt(p, i);
            } else if (nxt == '/' && p->in_heading && at(p, i+2) == 'h'
                       && at(p, i+3) >= '1' && at(p, i+3) <= '6') {
                p->in_heading = 0;
                i = skip_past_gt(p, i);
            } else if (nxt == '/' && p->in_bold && at(p, i+2) == 'b') {
                p->in_bold = 0;
                i = skip_past_gt(p, i);
            } else if (p->in_discard) {
                i = find_first_closing(p, i);
                if (i == -2) break;
                p->in_discard = 0;
            } else {
                i = parse_tag(p, i);
            }
        } else {
            if (!p->in_discard) i = parse_text(p, i);
            else i++;
        }
        if (i == -2) break;
    }
}

/* ---------------- stem cache: token bytes -> stem bytes ---------------- */

typedef struct {
    char *key; Py_ssize_t klen;
    char *val; Py_ssize_t vlen;
} CacheEnt;

static CacheEnt *cache_tab = NULL;
static Py_ssize_t cache_cap = 0, cache_n = 0;
static PyObject *stem_fn = NULL;   /* Python functions.stemmer.stem */

static int cache_grow(void) {
    Py_ssize_t ncap = cache_cap ? cache_cap * 2 : 1 << 14;
    CacheEnt *nt = PyMem_Calloc(ncap, sizeof(CacheEnt));
    if (!nt) return -1;
    for (Py_ssize_t i = 0; i < cache_cap; i++) {
        if (!cache_tab[i].key) continue;
        uint32_t h = fnv1a(cache_tab[i].key, cache_tab[i].klen) & (ncap - 1);
        while (nt[h].key) h = (h + 1) & (ncap - 1);
        nt[h] = cache_tab[i];
    }
    PyMem_Free(cache_tab);
    cache_tab = nt; cache_cap = ncap;
    return 0;
}

/* returns 0 ok (stem copied out), -1 on Python error */
static int stem_lookup(const char *tok, Py_ssize_t tlen,
                       const char **sout, Py_ssize_t *slen) {
    if (cache_n * 2 >= cache_cap && cache_grow() < 0) {
        PyErr_NoMemory(); return -1;
    }
    uint32_t h = fnv1a(tok, tlen) & (cache_cap - 1);
    while (cache_tab[h].key) {
        if (cache_tab[h].klen == tlen && memcmp(cache_tab[h].key, tok, tlen) == 0) {
            *sout = cache_tab[h].val; *slen = cache_tab[h].vlen;
            return 0;
        }
        h = (h + 1) & (cache_cap - 1);
    }
    /* miss: word bytes -> str (utf-8, replace) -> stem() -> utf-8 bytes */
    PyObject *uni = PyUnicode_DecodeUTF8(tok, tlen, "replace");
    if (!uni) return -1;
    PyObject *res = PyObject_CallFunctionObjArgs(stem_fn, uni, NULL);
    Py_DECREF(uni);
    if (!res) return -1;
    Py_ssize_t rlen;
    const char *rutf = PyUnicode_AsUTF8AndSize(res, &rlen);
    if (!rutf) { Py_DECREF(res); return -1; }
    CacheEnt *e = &cache_tab[h];
    e->key = PyMem_Malloc(tlen ? tlen : 1);
    e->val = PyMem_Malloc(rlen ? rlen : 1);
    if (!e->key || !e->val) { Py_DECREF(res); PyErr_NoMemory(); return -1; }
    memcpy(e->key, tok, tlen); e->klen = tlen;
    memcpy(e->val, rutf, rlen); e->vlen = rlen;
    Py_DECREF(res);
    cache_n++;
    *sout = e->val; *slen = rlen;
    return 0;
}

/* ---------------- per-doc term aggregation ---------------- */

typedef struct {
    const char *term; Py_ssize_t tlen;   /* '@'-prefixed for title terms */
    int order;                            /* first-seen index */
    int tf;
    int maxflag;
} AggEnt;

/* parse_doc(html: bytes) ->
   (text:bytes, title_chunk:bytes, dl:int,
    p_terms:list[str], p_tfs, p_flags, p_offs, p_poss, p_fposs,
    n_title_terms, word_count, title_len, english:bool, links:list[bytes]) */
static PyObject *parse_doc(PyObject *self, PyObject *arg) {
    if (!stem_fn) {
        PyErr_SetString(PyExc_RuntimeError, "se_native.init(stem) not called");
        return NULL;
    }
    Py_buffer view;
    if (PyObject_GetBuffer(arg, &view, PyBUF_SIMPLE) < 0) return NULL;

    /* ASCII lowercase copy (stringToLower, HtmlParser.cpp:23-30) */
    Py_ssize_t L = view.len;
    char *low = PyMem_Malloc(L ? L : 1);
    if (!low) { PyBuffer_Release(&view); return PyErr_NoMemory(); }
    const uint8_t *src = view.buf;
    for (Py_ssize_t i = 0; i < L; i++) {
        uint8_t c = src[i];
        low[i] = (c >= 'A' && c <= 'Z') ? (char)(c + 32) : (char)c;
    }
    PyBuffer_Release(&view);

    P p; memset(&p, 0, sizeof(p));
    p.d = low; p.L = L; p.english = 1; p.discarding = "";
    run_parser(&p);
    if (p.oom) {
        /* no Buf exists at this point — only the span arrays + lowercase
           copy need freeing */
        spans_free(&p.body); spans_free(&p.title);
        spans_free(&p.links); PyMem_Free(low);
        return PyErr_NoMemory();
    }

    PyObject *ret = NULL;
    PyObject *p_terms = NULL, *p_tfs = NULL, *p_flags = NULL, *p_offs = NULL,
             *p_poss = NULL, *p_fposs = NULL, *links = NULL,
             *text_b = NULL, *title_b = NULL;
    /* stems per position: (term ptr/len into cache or tmpbuf, flag) */
    Py_ssize_t npos_cap = p.title.len + p.body.len;
    const char **tptr = PyMem_Malloc((npos_cap ? npos_cap : 1) * sizeof(char *));
    Py_ssize_t *tlen = PyMem_Malloc((npos_cap ? npos_cap : 1) * sizeof(Py_ssize_t));
    int *tflag = PyMem_Malloc((npos_cap ? npos_cap : 1) * sizeof(int));
    Buf atbuf; memset(&atbuf, 0, sizeof(atbuf));   /* '@'-prefixed title stems */
    AggEnt *agg = NULL;
    Py_ssize_t *aggmap = NULL;
    if (!tptr || !tlen || !tflag) { PyErr_NoMemory(); goto done; }

    Py_ssize_t npos = 0;
    /* title terms first ('@'-decorated, flags 0; tokenize.py doc_terms) */
    for (Py_ssize_t i = 0; i < p.title.len; i++) {
        const char *s; Py_ssize_t sl;
        if (stem_lookup(low + p.title.p[i].off, p.title.p[i].len, &s, &sl) < 0)
            goto done;
        if (sl == 0) continue;
        /* build '@'+stem in atbuf; record offset (buffer may realloc, so
           store offsets now, fix pointers after the loop) */
        Py_ssize_t off = atbuf.len;
        if (buf_put(&atbuf, "@", 1) < 0 || buf_put(&atbuf, s, sl) < 0) {
            PyErr_NoMemory(); goto done;
        }
        tptr[npos] = (const char *)(intptr_t)off;  /* offset, fixed later */
        tlen[npos] = sl + 1;
        tflag[npos] = -1;                           /* marker: title (flag 0) */
        npos++;
    }
    Py_ssize_t n_title_terms = npos;
    for (Py_ssize_t i = 0; i < p.body.len; i++) {
        const char *s; Py_ssize_t sl;
        if (stem_lookup(low + p.body.p[i].off, p.body.p[i].len, &s, &sl) < 0)
            goto done;
        if (sl == 0) continue;
        tptr[npos] = s; tlen[npos] = sl; tflag[npos] = p.body.p[i].flag;
        npos++;
    }
    /* fix title-term pointers now that atbuf is stable */
    for (Py_ssize_t i = 0; i < n_title_terms; i++) {
        tptr[i] = atbuf.p + (Py_ssize_t)(intptr_t)tptr[i];
        tflag[i] = 0;
    }

    /* aggregate by term, first-seen order (extract.py per-doc agg) */
    Py_ssize_t acap = 16;
    while (acap < npos * 2) acap *= 2;
    agg = PyMem_Calloc(acap, sizeof(AggEnt));
    aggmap = PyMem_Malloc((npos ? npos : 1) * sizeof(Py_ssize_t));
    if (!agg || !aggmap) { PyErr_NoMemory(); goto done; }
    Py_ssize_t ndistinct = 0;
    for (Py_ssize_t i = 0; i < npos; i++) {
        uint32_t h = fnv1a(tptr[i], tlen[i]) & (acap - 1);
        while (agg[h].term) {
            if (agg[h].tlen == tlen[i] && memcmp(agg[h].term, tptr[i], tlen[i]) == 0)
                break;
            h = (h + 1) & (acap - 1);
        }
        if (!agg[h].term) {
            agg[h].term = tptr[i]; agg[h].tlen = tlen[i];
            agg[h].order = (int)ndistinct++;
            agg[h].tf = 0; agg[h].maxflag = 0;
        }
        agg[h].tf++;
        if (tflag[i] > agg[h].maxflag) agg[h].maxflag = tflag[i];
        aggmap[i] = h;
    }

    /* outputs */
    p_terms = PyList_New(ndistinct);
    p_tfs = PyList_New(ndistinct);
    p_flags = PyList_New(ndistinct);
    p_offs = PyList_New(ndistinct);
    p_poss = PyList_New(npos);
    p_fposs = PyList_New(npos);
    if (!p_terms || !p_tfs || !p_flags || !p_offs || !p_poss || !p_fposs)
        goto done;
    {
        /* offsets in first-seen order; positions grouped per term */
        Py_ssize_t *offs = PyMem_Malloc((ndistinct ? ndistinct : 1) * sizeof(Py_ssize_t));
        Py_ssize_t *fill = PyMem_Malloc((ndistinct ? ndistinct : 1) * sizeof(Py_ssize_t));
        int err = !offs || !fill;
        if (!err) {
            /* per-order tf: walk table once */
            Py_ssize_t run = 0;
            Py_ssize_t *tf_by_order = PyMem_Calloc(ndistinct ? ndistinct : 1,
                                                   sizeof(Py_ssize_t));
            if (!tf_by_order) err = 1;
            if (!err) {
                for (Py_ssize_t h = 0; h < acap; h++)
                    if (agg[h].term) tf_by_order[agg[h].order] = agg[h].tf;
                for (Py_ssize_t o = 0; o < ndistinct; o++) {
                    offs[o] = run; fill[o] = run; run += tf_by_order[o];
                }
                PyMem_Free(tf_by_order);
            }
        }
        if (err) { PyMem_Free(offs); PyMem_Free(fill); PyErr_NoMemory(); goto done; }
        for (Py_ssize_t h = 0; h < acap; h++) {
            if (!agg[h].term) continue;
            int o = agg[h].order;
            PyObject *t = PyUnicode_DecodeUTF8(agg[h].term, agg[h].tlen, "replace");
            if (!t) { PyMem_Free(offs); PyMem_Free(fill); goto done; }
            PyList_SET_ITEM(p_terms, o, t);
            PyList_SET_ITEM(p_tfs, o, PyLong_FromLong(agg[h].tf));
            PyList_SET_ITEM(p_flags, o, PyLong_FromLong(agg[h].maxflag));
            PyList_SET_ITEM(p_offs, o, PyLong_FromSsize_t(offs[o]));
        }
        for (Py_ssize_t i = 0; i < npos; i++) {
            Py_ssize_t h = aggmap[i];
            Py_ssize_t slot = fill[agg[h].order]++;
            PyList_SET_ITEM(p_poss, slot, PyLong_FromSsize_t(i));
            PyList_SET_ITEM(p_fposs, slot, PyLong_FromLong(tflag[i]));
        }
        PyMem_Free(offs); PyMem_Free(fill);
    }

    /* text = space-joined raw body words; title_chunk likewise for title */
    {
        Buf tb; memset(&tb, 0, sizeof(tb));
        for (Py_ssize_t i = 0; i < p.body.len; i++) {
            if (i && buf_put(&tb, " ", 1) < 0) { buf_free(&tb); PyErr_NoMemory(); goto done; }
            if (buf_put(&tb, low + p.body.p[i].off, p.body.p[i].len) < 0) {
                buf_free(&tb); PyErr_NoMemory(); goto done;
            }
        }
        text_b = PyBytes_FromStringAndSize(tb.p ? tb.p : "", tb.len);
        buf_free(&tb);
        if (!text_b) goto done;
    }
    {
        Buf tb; memset(&tb, 0, sizeof(tb));
        for (Py_ssize_t i = 0; i < p.title.len; i++) {
            if (i && buf_put(&tb, " ", 1) < 0) { buf_free(&tb); PyErr_NoMemory(); goto done; }
            if (buf_put(&tb, low + p.title.p[i].off, p.title.p[i].len) < 0) {
                buf_free(&tb); PyErr_NoMemory(); goto done;
            }
        }
        title_b = PyBytes_FromStringAndSize(tb.p ? tb.p : "", tb.len);
        buf_free(&tb);
        if (!title_b) goto done;
    }
    links = PyList_New(p.links.len);
    if (!links) goto done;
    for (Py_ssize_t i = 0; i < p.links.len; i++) {
        PyObject *u = PyBytes_FromStringAndSize(low + p.links.p[i].off,
                                                p.links.p[i].len);
        if (!u) goto done;
        PyList_SET_ITEM(links, i, u);
    }

    ret = Py_BuildValue(
        "(OOnOOOOOOnnnOO)",
        text_b, title_b, (Py_ssize_t)npos,
        p_terms, p_tfs, p_flags, p_offs, p_poss, p_fposs,
        n_title_terms,
        (Py_ssize_t)(p.body.len + p.title.len),   /* word_count */
        (Py_ssize_t)p.title.len,                  /* title_len */
        p.english ? Py_True : Py_False,
        links);

done:
    Py_XDECREF(text_b); Py_XDECREF(title_b);
    Py_XDECREF(p_terms); Py_XDECREF(p_tfs); Py_XDECREF(p_flags);
    Py_XDECREF(p_offs); Py_XDECREF(p_poss); Py_XDECREF(p_fposs);
    Py_XDECREF(links);
    PyMem_Free(tptr); PyMem_Free(tlen); PyMem_Free(tflag);
    PyMem_Free(agg); PyMem_Free(aggmap);
    buf_free(&atbuf);
    spans_free(&p.body); spans_free(&p.title); spans_free(&p.links);
    PyMem_Free(low);
    return ret;
}

static PyObject *init_mod(PyObject *self, PyObject *arg) {
    if (!PyCallable_Check(arg)) {
        PyErr_SetString(PyExc_TypeError, "init(stem) needs a callable");
        return NULL;
    }
    Py_XDECREF(stem_fn);
    Py_INCREF(arg);
    stem_fn = arg;
    Py_RETURN_NONE;
}

static PyObject *cache_stats(PyObject *self, PyObject *noarg) {
    return Py_BuildValue("(nn)", cache_n, cache_cap);
}

static PyMethodDef methods[] = {
    {"init", init_mod, METH_O,
     "init(stem_callable): set the Python stemmer used on cache misses"},
    {"parse_doc", parse_doc, METH_O,
     "parse_doc(html_bytes) -> extraction tuple (see extract.py)"},
    {"cache_stats", cache_stats, METH_NOARGS, "(entries, capacity)"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "se_native",
    "C fast path for reference-parity HTML extraction", -1, methods
};

PyMODINIT_FUNC PyInit_se_native(void) {
    tag_tab_init();
    return PyModule_Create(&mod);
}
