"""Offline dataset-construction scripts (reference ``dcode/`` equivalents).

These are one-shot host-side tools — not TPU work (SURVEY §2 "Offline
dataset construction" row): SRL-tagging ActivityNet Captions, aligning SRL
args with ActivityNet-Entities boxes, building the GT5 proposal sets from
P100 detections, and building the contrastive-sampling dicts.
"""
