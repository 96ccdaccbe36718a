"""Pure-Python shim for the ``anytree`` package API surface the reference
uses (``cupid/schema_element_node.py``, ``schema_tree.py``, ``tree_match.py``,
``linguistic_matching.py``): NodeMixin with parent/children wiring, height,
leaves; PostOrderIter; LevelOrderIter(maxlevel=); RenderTree (repr only)."""

from collections import deque


class NodeMixin:
    """Parent/children tree plumbing, anytree-compatible for the attributes
    the reference touches."""

    __parent = None
    __children = None

    @property
    def parent(self):
        return self.__parent

    @parent.setter
    def parent(self, value):
        old = self.__parent
        if old is not None and self in (old.__children or []):
            old.__children.remove(self)
        self.__parent = value
        if value is not None:
            if value.__children is None:
                value.__children = []
            value.__children.append(self)

    @property
    def children(self):
        return tuple(self.__children or ())

    @children.setter
    def children(self, value):
        for child in list(self.__children or []):
            child.parent = None
        for child in value:
            child.parent = self

    @property
    def is_leaf(self):
        return not self.__children

    @property
    def height(self):
        if not self.__children:
            return 0
        return 1 + max(c.height for c in self.__children)

    @property
    def depth(self):
        d, node = 0, self.__parent
        while node is not None:
            d, node = d + 1, node.__parent
        return d

    @property
    def root(self):
        node = self
        while node.__parent is not None:
            node = node.__parent
        return node

    @property
    def leaves(self):
        if not self.__children:
            return (self,)
        out = []
        for c in self.__children:
            out.extend(c.leaves)
        return tuple(out)


def PostOrderIter(node):
    for child in node.children:
        yield from PostOrderIter(child)
    yield node


def LevelOrderIter(node, maxlevel=None):
    """BFS; root is level 1; nodes at level > maxlevel are excluded."""
    q = deque([(node, 1)])
    while q:
        n, level = q.popleft()
        if maxlevel is not None and level > maxlevel:
            continue
        yield n
        for child in n.children:
            q.append((child, level + 1))


class RenderTree:
    """Minimal (pre, fill, node) renderer — the reference only prints it."""

    def __init__(self, node):
        self.node = node

    def __iter__(self):
        def walk(n, depth):
            yield ("    " * depth, "    " * depth, n)
            for c in n.children:
                yield from walk(c, depth + 1)

        return walk(self.node, 0)
