"""World state pytrees and the SLAM pipeline orchestrator."""
