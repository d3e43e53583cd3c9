"""Dataset explorer: embeddings, similarity search, and label queries.

Rebuild of the reference's ``ultralytics/data/explorer`` (Explorer +
ExplorerDataset): the reference embeds every image with the model and
stores them in a LanceDB table for similarity search and SQL filtering.
Here the embedding store is a plain numpy matrix (cosine similarity is one
matmul — MXU food), embeddings come from the model's own neck features via
the GraphModel ``capture`` taps, and queries are Python predicates over the
parsed labels instead of SQL strings.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.data.dataset import YOLODataset
from experiment_yolo_tpu.utils import LOGGER


# ---------------------------------------------------------------------------
# SQL WHERE-clause engine (the reference runs sql_query through duckdb over a
# LanceDB table, explorer.py:172-216; duckdb isn't in this image, so the same
# query grammar is evaluated directly over the parsed label records)
# ---------------------------------------------------------------------------

_SQL_TOKEN = re.compile(
    r"\s*(?:(?P<str>'(?:[^']|'')*')"          # 'string' ('' escapes ')
    r"|(?P<num>-?\d+(?:\.\d+)?)"               # number
    r"|(?P<op><=|>=|<>|!=|==|=|<|>)"           # comparison ops
    r"|(?P<punct>[(),])"                        # punctuation
    r"|(?P<word>[A-Za-z_][A-Za-z_0-9]*))"      # identifier / keyword
)


def _sql_tokenize(s: str) -> List[tuple]:
    toks, pos = [], 0
    while pos < len(s):
        m = _SQL_TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"sql: cannot tokenize at: {s[pos:pos + 20]!r}")
            break
        pos = m.end()
        if m.lastgroup == "str":
            toks.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "num":
            v = m.group("num")
            toks.append(("num", float(v) if "." in v else int(v)))
        elif m.lastgroup == "op":
            toks.append(("op", {"==": "=", "<>": "!="}.get(m.group("op"), m.group("op"))))
        elif m.lastgroup == "punct":
            toks.append(("punct", m.group("punct")))
        else:
            w = m.group("word")
            toks.append(("kw", w.upper()) if w.upper() in
                        ("AND", "OR", "NOT", "LIKE", "IN", "IS", "NULL", "BETWEEN")
                        else ("ident", w))
    return toks


class _SqlWhere:
    """Recursive-descent parser for SQL WHERE clauses -> record predicate.

    Grammar: OR > AND > NOT > comparison; comparisons support = != < <= > >=,
    LIKE / NOT LIKE (%, _ wildcards), IN / NOT IN (...), BETWEEN a AND b,
    IS [NOT] NULL, parentheses. List-valued columns (labels, cls) use
    any-element semantics for comparisons/IN — `cls = 2` means "any box of
    class 2" — and LIKE matches against the list's string form, so the
    reference's canonical ``labels LIKE '%person%'`` works unchanged."""

    def __init__(self, clause: str):
        self.toks = _sql_tokenize(clause)
        self.i = 0
        self.fn = self._or()
        if self.i != len(self.toks):
            raise ValueError(f"sql: trailing tokens: {self.toks[self.i:]}")

    def _peek(self, kind=None, val=None):
        if self.i >= len(self.toks):
            return False
        k, v = self.toks[self.i]
        return (kind is None or k == kind) and (val is None or v == val)

    def _eat(self, kind=None, val=None):
        if not self._peek(kind, val):
            got = self.toks[self.i] if self.i < len(self.toks) else "<end>"
            raise ValueError(f"sql: expected {val or kind}, got {got}")
        self.i += 1
        return self.toks[self.i - 1][1]

    def _or(self):
        left = self._and()
        while self._peek("kw", "OR"):
            self._eat()
            lhs, rhs = left, self._and()
            left = (lambda a, b: lambda r: a(r) or b(r))(lhs, rhs)
        return left

    def _and(self):
        left = self._not()
        while self._peek("kw", "AND"):
            self._eat()
            lhs, rhs = left, self._not()
            left = (lambda a, b: lambda r: a(r) and b(r))(lhs, rhs)
        return left

    def _not(self):
        if self._peek("kw", "NOT"):
            self._eat()
            inner = self._not()
            return lambda r: not inner(r)
        return self._primary()

    def _primary(self):
        if self._peek("punct", "("):
            self._eat()
            e = self._or()
            self._eat("punct", ")")
            return e
        return self._comparison()

    def _operand(self):
        if self._peek("ident"):
            name = self._eat()
            return ("col", name)
        if self._peek("str") or self._peek("num"):
            return ("lit", self._eat())
        got = self.toks[self.i] if self.i < len(self.toks) else "<end>"
        raise ValueError(f"sql: expected column or literal, got {got}")

    @staticmethod
    def _resolve(operand, rec):
        kind, v = operand
        if kind == "lit":
            return v
        if v not in rec:
            raise KeyError(f"sql: unknown column {v!r}; have {sorted(rec)}")
        return rec[v]

    @staticmethod
    def _cmp(op, a, b):
        if isinstance(a, (list, tuple, np.ndarray)):  # any-element semantics
            return any(_SqlWhere._cmp(op, x, b) for x in a)
        if isinstance(b, (list, tuple, np.ndarray)):
            return any(_SqlWhere._cmp(op, a, x) for x in b)
        if isinstance(a, (int, float, np.integer, np.floating)) != isinstance(
            b, (int, float, np.integer, np.floating)
        ):
            a, b = str(a), str(b)  # duckdb-style loose coercion
        return {"=": lambda: a == b, "!=": lambda: a != b, "<": lambda: a < b,
                "<=": lambda: a <= b, ">": lambda: a > b, ">=": lambda: a >= b}[op]()

    def _comparison(self):
        left = self._operand()
        negate = False
        if self._peek("kw", "NOT"):
            self._eat()
            negate = True
        if self._peek("kw", "LIKE"):
            self._eat()
            pat = self._eat("str")
            rx = re.compile(
                "^" + re.escape(pat).replace("%", ".*").replace("_", ".") + "$",
                re.IGNORECASE | re.DOTALL,
            )

            def fn(r, left=left, rx=rx):
                v = self._resolve(left, r)
                if isinstance(v, (list, tuple, np.ndarray)):
                    v = str(list(v))
                return rx.match(str(v)) is not None
        elif self._peek("kw", "IN"):
            self._eat()
            self._eat("punct", "(")
            vals = [self._eat()]
            while self._peek("punct", ","):
                self._eat()
                vals.append(self._eat())
            self._eat("punct", ")")

            def fn(r, left=left, vals=vals):
                return any(self._cmp("=", self._resolve(left, r), v) for v in vals)
        elif self._peek("kw", "BETWEEN"):
            self._eat()
            lo = self._operand()
            self._eat("kw", "AND")
            hi = self._operand()

            def fn(r, left=left, lo=lo, hi=hi):
                v = self._resolve(left, r)
                return self._cmp(">=", v, self._resolve(lo, r)) and self._cmp(
                    "<=", v, self._resolve(hi, r)
                )
        elif self._peek("kw", "IS"):
            self._eat()
            neg2 = bool(self._peek("kw", "NOT")) and (self._eat() or True)
            self._eat("kw", "NULL")

            def fn(r, left=left, neg2=neg2):
                v = self._resolve(left, r)
                isnull = v is None or (hasattr(v, "__len__") and len(v) == 0)
                return isnull != neg2
        else:
            op = self._eat("op")
            right = self._operand()

            def fn(r, left=left, op=op, right=right):
                return self._cmp(op, self._resolve(left, r), self._resolve(right, r))

        return (lambda r: not fn(r)) if negate else fn

    def __call__(self, rec: dict) -> bool:
        return bool(self.fn(rec))


def parse_sql_where(clause: str) -> Callable[[dict], bool]:
    """Compile a SQL WHERE clause into a predicate over label records."""
    return _SqlWhere(clause)


def make_embed_fn(model):
    """Jitted (variables, uint8 NHWC imgs) -> (B, D) L2-normalized embeddings:
    global-average-pooled concat of the detect head's input feature maps,
    tapped via GraphModel ``capture`` (the reference's YOLO.embed taps,
    engine/model.py:357). Shared by Explorer and the YOLO.embed facade."""
    f = model.specs[model.detect_idx].f
    taps = tuple(j if j >= 0 else model.detect_idx - 1 for j in f)

    def embed(variables, imgs):
        imgs = imgs.astype(jnp.float32) / 255.0
        _, feats = model.module.apply(variables, imgs, False, capture=taps)
        pooled = jnp.concatenate([fm.mean(axis=(1, 2)) for fm in feats], -1)
        return pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-8)

    return jax.jit(embed)


class Explorer:
    """Embed a dataset with a detection model and query it.

    API surface mirrored from the reference Explorer (data/explorer/
    explorer.py): create_embeddings_table -> ``build``; get_similar ->
    ``similar``; sql_query -> ``query``; plot_similar -> caller-side.
    """

    def __init__(self, data_dir: str | Path, model, variables, imgsz: int = 256,
                 batch: int = 8, names: Optional[dict] = None):
        self.dataset = YOLODataset(data_dir, imgsz=imgsz, augment=False)
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.batch = batch
        self.names = names or {}  # {cls_id: name} for the 'labels' column
        self.embeddings: Optional[np.ndarray] = None  # (N, D) L2-normalized

        self._embed = make_embed_fn(model)

    def build(self) -> np.ndarray:
        """Compute embeddings for every image (create_embeddings_table)."""
        out = []
        n = len(self.dataset)
        for s in range(0, n, self.batch):
            idxs = list(range(s, min(s + self.batch, n)))
            imgs = [self.dataset.get_val_sample(i)["img"] for i in idxs]
            while len(imgs) < self.batch:  # static batch pad
                imgs.append(np.zeros_like(imgs[0]))
            e = jax.device_get(self._embed(self.variables, jnp.asarray(np.stack(imgs))))
            out.append(e[: len(idxs)])
        self.embeddings = np.concatenate(out, 0)
        LOGGER.info(f"explorer: embedded {n} images ({self.embeddings.shape[1]}-d)")
        return self.embeddings

    def similar(self, idx: int, topk: int = 5) -> List[tuple]:
        """Most-similar images to dataset index ``idx`` (get_similar)."""
        assert self.embeddings is not None, "call build() first"
        sims = self.embeddings @ self.embeddings[idx]
        order = np.argsort(-sims)
        out = [(int(j), float(sims[j]), self.dataset.im_files[j]) for j in order if j != idx]
        return out[:topk]

    def similar_to_image(self, img: np.ndarray, topk: int = 5) -> List[tuple]:
        """Similarity search with an external query image (BGR uint8)."""
        assert self.embeddings is not None, "call build() first"
        import cv2

        from experiment_yolo_tpu.data.augment import letterbox

        q = letterbox(img, (self.imgsz, self.imgsz))[0][..., ::-1]  # BGR -> RGB
        batch = np.zeros((self.batch, self.imgsz, self.imgsz, 3), q.dtype)
        batch[0] = q
        e = jax.device_get(self._embed(self.variables, jnp.asarray(batch)))[0]
        sims = self.embeddings @ e
        order = np.argsort(-sims)[:topk]
        return [(int(j), float(sims[j]), self.dataset.im_files[j]) for j in order]

    def query(self, predicate: Callable[[dict], bool]) -> List[int]:
        """Label-predicate filtering (the reference's sql_query, minus the
        SQL string parser): predicate sees {'cls': (n,), 'bboxes_n': (n,4),
        'im_file': str} per image."""
        hits = []
        for i, (f, lab) in enumerate(zip(self.dataset.im_files, self.dataset.labels)):
            rec = {"cls": lab["cls"], "bboxes_n": lab["bboxes_n"], "im_file": f}
            if predicate(rec):
                hits.append(i)
        return hits

    def _record(self, i: int) -> dict:
        """The queryable columns for image i (reference table schema,
        explorer/utils.py:18-35: im_file, labels, cls, bboxes)."""
        lab = self.dataset.labels[i]
        cls = [int(c) for c in np.asarray(lab["cls"]).reshape(-1)]
        return {
            "idx": i,
            "im_file": str(self.dataset.im_files[i]),
            "cls": cls,
            "labels": [self.names.get(c, str(c)) for c in cls],
            "bboxes": [list(map(float, b)) for b in np.asarray(lab["bboxes_n"]).reshape(-1, 4)],
            "n_labels": len(cls),
        }

    def sql_query(self, query: str) -> List[dict]:
        """Run a SQL-like query over the label table (reference
        explorer.py:172 sql_query, minus the duckdb/LanceDB dependency —
        the WHERE grammar is evaluated in-process by ``parse_sql_where``).

        Accepts either a full ``SELECT * FROM 'table' WHERE ...`` or a bare
        ``WHERE ...`` clause, like the reference. Returns matching records
        as a list of dicts (columns: idx, im_file, labels, cls, bboxes,
        n_labels)."""
        q = query.strip()
        up = q.upper()
        if not (up.startswith("SELECT") or up.startswith("WHERE")):
            raise ValueError(
                f"Query must start with SELECT or WHERE. You can either pass "
                f"the entire query or just the WHERE clause. found {query}"
            )
        if up.startswith("SELECT"):
            m = re.search(r"\bWHERE\b", q, re.IGNORECASE)
            q = q[m.end():] if m else ""
        else:
            q = q[5:]
        LOGGER.info(f"explorer: running query: {query}")
        pred = parse_sql_where(q) if q.strip() else (lambda r: True)
        return [rec for i in range(len(self.dataset))
                if pred(rec := self._record(i))]

    def plot_sql_query(self, query: str, labels: bool = True,
                       save_path: Optional[str | Path] = None) -> Optional[np.ndarray]:
        """Render the images matched by ``query`` as one mosaic grid
        (reference explorer.py:218 plot_sql_query). Returns the RGB array
        (and writes it to ``save_path`` if given); None when no rows match."""
        rows = self.sql_query(query)
        if not rows:
            LOGGER.info("explorer: no results found")
            return None
        import cv2

        from experiment_yolo_tpu.utils.plotting import plot_images

        take = rows[:16]
        m = max((r["n_labels"] for r in take), default=0)
        imgs = np.stack([self.dataset.get_val_sample(r["idx"])["img"] for r in take])
        bbs = np.zeros((len(take), max(m, 1), 4), np.float32)
        cls = np.zeros((len(take), max(m, 1)), np.float32)
        msk = np.zeros((len(take), max(m, 1)), bool)
        for i, r in enumerate(take):
            n = r["n_labels"]
            if n and labels:
                bbs[i, :n] = np.asarray(r["bboxes"], np.float32)
                cls[i, :n] = np.asarray(r["cls"], np.float32)
                msk[i, :n] = True
        out = Path(save_path) if save_path else Path("explorer_query.jpg")
        plot_images(imgs, bbs, cls, msk, fname=out, names=self.names or None)
        return cv2.imread(str(out))[..., ::-1]

    def class_counts(self) -> dict:
        """Per-class instance counts across the dataset."""
        counts: dict = {}
        for lab in self.dataset.labels:
            for c in lab["cls"].astype(int):
                counts[int(c)] = counts.get(int(c), 0) + 1
        return counts
