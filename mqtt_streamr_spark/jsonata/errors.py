class JsonataError(Exception):
    """Parse- or evaluation-time error in a JSONata expression."""


class NotCompilable(Exception):
    """Raised by the Column compiler when the AST needs the interpreter
    fallback (recursion, closures, descendants, dynamic keys, ...)."""
