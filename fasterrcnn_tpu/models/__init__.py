"""Model stages: backbones, RPN, detector head, and the orchestrator."""
