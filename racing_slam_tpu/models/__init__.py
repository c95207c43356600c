"""Learned feature frontend: SuperPoint-style extractor, LightGlue-style matcher."""
