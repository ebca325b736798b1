from .hygiene import is_bounded_subtree, parse_plan_tree, unbounded_bnljs

__all__ = ["parse_plan_tree", "is_bounded_subtree", "unbounded_bnljs"]
