"""Minimal deterministic HTML DOM with a goquery-compatible subset.

Built on stdlib ``html.parser`` (no lxml/selectolax in this environment).
Shared by the engine's pandas UDFs, the fixture generator and the oracle so
extracted text is byte-identical across all three (the BASELINE correctness
gate: `strings.Join(strings.Fields(sel.Text()), "")`, reference
exampes/finder/bm1365Model/JcUx.go:195-200).

Supported selector grammar (all the reference uses):

    selector   := simple (WS simple)*          # descendant combinator only
    simple     := tag? ('.' class)* ('[' attr ']')?

e.g. ``.visible-xs-block .bread div p a``, ``div[style]``, ``a``, ``img``.

``find()`` returns matches in document order, deduplicated — goquery's
``Find`` semantics. ``text()`` concatenates all descendant text nodes in
document order — goquery's ``Text()`` semantics.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "classes", "children", "parent", "data")

    def __init__(self, tag: str | None, attrs=None, data: str = ""):
        self.tag = tag  # None for text nodes
        self.attrs = dict(attrs or {})
        cls = self.attrs.get("class") or ""
        self.classes = set(cls.split())
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.data = data

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    # goquery Selection.Text(): all text nodes, document order.
    def text(self) -> str:
        out: list[str] = []

        def walk(n: "Node"):
            if n.tag is None:
                out.append(n.data)
            for c in n.children:
                walk(c)

        walk(self)
        return "".join(out)

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def iter(self):
        """All element descendants (not self), document order."""
        for c in self.children:
            if c.tag is not None:
                yield c
                yield from c.iter()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs)
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].append(Node(tag, attrs))

    def handle_endtag(self, tag):
        # close nearest matching open tag (lenient recovery)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Node(None, data=data))


def parse(html: str | bytes) -> Node:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


class _Simple:
    __slots__ = ("tag", "classes", "attrs")

    def __init__(self, token: str):
        self.tag = None
        self.classes: list[str] = []
        self.attrs: list[str] = []
        rest = token
        # strip [attr] suffixes
        while "[" in rest:
            i = rest.index("[")
            j = rest.index("]", i)
            self.attrs.append(rest[i + 1 : j])
            rest = rest[:i] + rest[j + 1 :]
        parts = rest.split(".")
        if parts[0]:
            self.tag = parts[0].lower()
        self.classes = [c for c in parts[1:] if c]

    def matches(self, node: Node) -> bool:
        if node.tag is None:
            return False
        if self.tag is not None and node.tag != self.tag:
            return False
        for c in self.classes:
            if c not in node.classes:
                return False
        for a in self.attrs:
            if a not in node.attrs:
                return False
        return True


def _compile(selector: str) -> list[_Simple]:
    return [_Simple(tok) for tok in selector.split() if tok]


def _ancestor_chain_matches(node: Node, parts: list[_Simple]) -> bool:
    """node matched parts[-1]; earlier parts must match some ancestors in
    order (descendant combinator, evaluated against the whole document —
    cascadia semantics)."""
    idx = len(parts) - 2
    cur = node.parent
    while idx >= 0 and cur is not None:
        if parts[idx].matches(cur):
            idx -= 1
        cur = cur.parent
    return idx < 0


def find(root: Node, selector: str) -> list[Node]:
    """goquery Find: descendants of root matching selector, document order."""
    parts = _compile(selector)
    if not parts:
        return []
    out = []
    for node in root.iter():
        if parts[-1].matches(node) and _ancestor_chain_matches(node, parts):
            out.append(node)
    return out
