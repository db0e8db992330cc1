"""End-to-end pipeline plans (stage orchestration over the operators)."""
