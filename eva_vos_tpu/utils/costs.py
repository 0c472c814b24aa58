"""Simulated human annotation time model, in seconds.

Parity target: ``util/helpers.py:50-58`` in the reference — these constants
are the x-axis of every result curve.
"""

ANNOTATION_COSTS = {
    "no_object": 3,
    "mask": 80,
    "click": 1.5,
    "3clicks": 3 * 1.5,
    "bbox": 7,
    "click_overhead": 1,
    "stop": 0,
}
