from .edge_text import parse_edge_lines, read_edge_text  # noqa: F401
