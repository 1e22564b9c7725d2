"""apted.helpers.Tree — bracket-notation tree parser, the format the
reference's to_nested_tuple emits: "{a{b{d}}{c}}" (utils/ted_utils.py:96-104).
"""


class Tree:
    __slots__ = ("name", "children")

    def __init__(self, name, *children):
        self.name = name
        self.children = list(children)

    @classmethod
    def from_text(cls, text: str) -> "Tree":
        stack, root = [], None
        i = 0
        while i < len(text):
            ch = text[i]
            if ch == "{":
                j = i + 1
                while j < len(text) and text[j] not in "{}":
                    j += 1
                node = cls(text[i + 1:j])
                if stack:
                    stack[-1].children.append(node)
                else:
                    root = node
                stack.append(node)
                i = j
            elif ch == "}":
                stack.pop()
                i += 1
            else:  # label continuation outside a fresh '{' (not produced
                i += 1  # by the reference, tolerated for robustness)
        if root is None:
            raise ValueError(f"empty tree text: {text!r}")
        return root

    def __repr__(self):
        return ("{" + self.name
                + "".join(repr(c) for c in self.children) + "}")
