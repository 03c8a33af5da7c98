"""Guidance modes: CFG plus the reference's three comparison baselines,
all expressed as scan-fusable combine functions over stacked eps branches.

  * CFG                 — [uncond; cond]                (standard)
  * Concept algebra     — [uncond; text; p0; p1; p2]    (evalscripts/
    concept_algebra.py:99-123: project the (text - p2) score difference off
    the normalized (p1 - p0) direction before CFG)
  * SLD                 — [uncond; text; safety]        (Safe Latent
    Diffusion, Schramowski et al. 2023; hyperparameter presets
    Weak/Medium/Max from evalscripts/sld-generate-images.py:48-66)
  * Debias-VL           — embedding-side calibration (evalscripts/
    debiasing_vl.py:12-23,76-79,110-112): a projection P = (lam*M + I)^-1
    applied to text embeddings; uses plain CFG at the eps level.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# concept algebra
# ---------------------------------------------------------------------------

def concept_algebra_combine(eps_branches: jnp.ndarray,
                            guidance_scale) -> jnp.ndarray:
    """5-way branch combine. Mirrors the reference exactly, including the
    GLOBAL (whole-tensor) norm and dot product across the sample batch
    (``concept_algebra.py:113-118`` computes u and the projection with
    tensor-wide sums)."""
    uncond, text, p0, p1, p2 = jnp.split(eps_branches, 5, axis=0)
    # Both whole-tensor reductions in fp32: the reference computes them in
    # fp32 torch, and a bf16 accumulation over ~1e5 elements carries only
    # ~3 significant digits into the projection coefficient.
    noise_tmp = (text - p2).astype(jnp.float32)
    u32 = (p1 - p0).astype(jnp.float32)
    u32 = u32 / jnp.sqrt((u32 ** 2).sum())
    proj = (noise_tmp * u32).sum()
    text = (text.astype(jnp.float32) - proj * u32).astype(text.dtype)
    return uncond + guidance_scale * (text - uncond)


# ---------------------------------------------------------------------------
# SLD (safe latent diffusion)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SLDConfig:
    sld_guidance_scale: float = 1000.0
    sld_warmup_steps: int = 10
    sld_threshold: float = 0.01
    sld_momentum_scale: float = 0.3
    sld_mom_beta: float = 0.4

    @classmethod
    def preset(cls, name: str) -> "SLDConfig":
        """Weak/Medium/Max presets (sld-generate-images.py:48-66)."""
        return {
            "Medium": cls(1000.0, 10, 0.01, 0.3, 0.4),
            "Max": cls(5000.0, 0, 1.0, 0.5, 0.7),
            "Weak": cls(200.0, 15, 0.0, 0.0, 0.0),
        }[name]


DEFAULT_SAFETY_CONCEPT = (
    "an image showing hate, harassment, violence, suffering, humiliation, "
    "harm, suicide, sexual, nudity, bodily fluids, blood, obscene gestures, "
    "illegal activity, drug use, theft, vandalism, weapons, child abuse, "
    "brutality, cruelty"
)


def sld_combine(eps_branches: jnp.ndarray, guidance_scale, step_index,
                momentum: jnp.ndarray, cfg: SLDConfig):
    """3-way branch combine with safety momentum carried through the scan.

    Returns (eps, new_momentum). Follows the SLDPipeline update: elementwise
    safety scale clamp, threshold gate, momentum accumulation, warmup gate.
    """
    uncond, text, safety = jnp.split(eps_branches, 3, axis=0)
    guidance = text - uncond

    diff = text - safety
    scale = jnp.clip(jnp.abs(diff) * cfg.sld_guidance_scale, None, 1.0)
    safety_scale = jnp.where(diff >= cfg.sld_threshold, 0.0, scale)
    guidance_safety = (safety - uncond) * safety_scale
    guidance_safety = guidance_safety + cfg.sld_momentum_scale * momentum
    new_momentum = (cfg.sld_mom_beta * momentum
                    + (1.0 - cfg.sld_mom_beta) * guidance_safety)

    active = step_index >= cfg.sld_warmup_steps
    guidance = jnp.where(active, guidance - guidance_safety, guidance)
    eps = uncond + guidance_scale * guidance
    return eps, new_momentum


# ---------------------------------------------------------------------------
# debias-VL calibration (embedding side)
# ---------------------------------------------------------------------------

def debias_vl_pair_matrix(z_i: np.ndarray, z_j: np.ndarray) -> np.ndarray:
    """A = z_i z_i^T + z_j z_j^T - z_i z_j^T - z_j z_i^T
    (debiasing_vl.py:12-15) == (z_i - z_j)(z_i - z_j)^T."""
    zi, zj = z_i[:, None], z_j[:, None]
    return zi @ zi.T + zj @ zj.T - zi @ zj.T - zj @ zi.T


def debias_vl_calibration(embeddings: np.ndarray, pairs,
                          lam: float = 500.0) -> np.ndarray:
    """P = (lam * mean_pairs A + I)^-1 (debiasing_vl.py:18-23,76-79)."""
    if not len(pairs):
        raise ValueError(
            "debias_vl_calibration needs at least one concept pair "
            "(empty --concepts?); dividing by zero pairs would produce "
            "a NaN projection that silently corrupts every embedding")
    d = embeddings.shape[1]
    m = np.zeros((d, d))
    for i, j in pairs:
        m += debias_vl_pair_matrix(embeddings[i], embeddings[j])
    m /= len(pairs)
    return np.linalg.inv(lam * m + np.eye(d))


def build_gender_pairs(debias_concepts) -> tuple[list[str], list[list[int]]]:
    """Male/female prompt pairs (debiasing_vl.py:59-67)."""
    prompts, pairs, counter = [], [], 0
    for cls_name in debias_concepts:
        cls_name = cls_name.lower()
        prompts += [f"A photo of a male {cls_name}.",
                    f"A photo of a female {cls_name}."]
        pairs.append([counter, counter + 1])
        counter += 2
    return prompts, pairs


DEBIAS_VL_DEFAULT_PROFESSIONS = [
    "Actor", "Architect", "Audiologist", "Author", "Baker", "Barber",
    "Blacksmith", "Bricklayer", "Bus Driver", "Butcher", "Chef", "Chemist",
    "Cleaner", "Coach", "Comedian", "Computer Programmer",
    "Construction Worker", "Consultant", "Counselor", "Dancer", "Dentist",
    "Designer", "Dietitian", "DJ", "Doctor", "Driver", "Economist",
    "Electrician", "Engineer", "Entrepreneur", "Farmer", "Florist",
    "Graphic Designer", "Hairdresser", "Historian", "Journalist", "Judge",
    "Lawyer", "Librarian", "Magician", "Makeup Artist", "Mathematician",
    "Marine Biologist", "Mechanic", "Model", "Musician", "Nanny", "Nurse",
    "Optician", "Painter", "Pastry Chef", "Pediatrician", "Photographer",
    "Plumber", "Police Officer", "Politician", "Professor", "Psychologist",
    "Real Estate Agent", "Receptionist", "Recruiter", "Researcher", "Sailor",
    "Salesperson", "Surveyor", "Singer", "Social Worker",
    "Software Developer", "Statistician", "Surgeon", "Teacher", "Technician",
    "Therapist", "Tour Guide", "Translator", "Vet", "Videographer", "Waiter",
    "Writer", "Zoologist",
]
