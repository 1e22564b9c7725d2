"""Headless stand-in for plotly (reference utils/viz_utils.py:7) so the
reference evaluator runs without the plotly/kaleido wheels. Figures record
nothing; write_html emits a placeholder file and to_image returns a valid
tiny PNG (PIL-openable, so plotly_fig2array and the GIF writer still work).
The reverse-parity harness only needs the NUMBERS the evaluator prints —
the reference's own viz artifacts are not under test."""

from . import graph_objects  # noqa: F401
