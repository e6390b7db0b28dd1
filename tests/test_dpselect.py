"""DPSelect parity tests against a torch oracle.

The oracle transcribes the reference algorithm (visual_compression.py:86-176)
using torch's own max_pool1d_with_indices / topk so that peak detection and
tie-breaking semantics are checked end-to-end, on random banks engineered to
contain exact ties.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from retake_tpu.ops import dpselect

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def oracle_keyframe_sync(bank_np, tgt_len, window_size=3):
    """Reference 'Keyframe' method, sync=True (torch oracle)."""
    bank = torch.from_numpy(bank_np)[None]  # [1, T, N, C]
    sim = F.cosine_similarity(bank[:, :-1], bank[:, 1:], dim=-1)
    dis = 1 - sim[0].float()
    dis = torch.cat([torch.ones_like(dis[:1]), dis], dim=0)  # [T, N]
    dis = dis.mean(1)
    keymask = torch.zeros_like(dis).bool()
    wm = F.max_pool1d_with_indices(
        dis[None, None, :], window_size, 1, padding=window_size // 2
    )[1].squeeze()
    cand = wm.unique()
    peaks = cand[(wm[cand] == cand).nonzero()].squeeze(-1)
    keymask[peaks] = True
    dis[peaks] += 2
    top = torch.topk(dis, k=tgt_len, sorted=False)[1].sort()[0]
    return top.numpy(), keymask[top].numpy()


def oracle_keyframe_async(bank_np, tgt_len, window_size=3):
    """Reference 'Keyframe' method, sync=False (per-patch) torch oracle."""
    bank = torch.from_numpy(bank_np)[None]
    sim = F.cosine_similarity(bank[:, :-1], bank[:, 1:], dim=-1)
    dis = 1 - sim[0].float()
    dis = torch.cat([torch.ones_like(dis[:1]), dis], dim=0)  # [T, N]
    dis = dis.transpose(0, 1)  # [N, T]
    keymask = torch.zeros_like(dis).bool()
    wm = F.max_pool1d_with_indices(
        dis[:, None, :], window_size, 1, padding=window_size // 2
    )[1].squeeze(1)
    for p in range(dis.shape[0]):
        cand = wm[p].unique()
        peaks = cand[(wm[p][cand] == cand).nonzero()][:, 0]
        keymask[p, peaks] = True
        dis[p, peaks] += 2
    top = torch.topk(dis, k=tgt_len, sorted=False, dim=1)[1].sort(dim=1)[0]
    top = top.transpose(0, 1)  # [t, N]
    keymask = keymask.transpose(0, 1).gather(0, top)
    return top.numpy(), keymask.numpy()


@pytest.mark.parametrize("t,n,c,tgt", [(17, 4, 8, 9), (32, 6, 16, 32), (8, 1, 4, 3)])
def test_dpselect_sync_matches_torch(rng, t, n, c, tgt):
    bank = rng.normal(size=(t, n, c)).astype(np.float32)
    # engineer duplicate frames -> exact dissimilarity ties
    bank[5] = bank[4]
    if t > 12:
        bank[12] = bank[11]
    exp_idx, exp_mask = oracle_keyframe_sync(bank, tgt)
    idx, mask = dpselect.dpselect(jnp.asarray(bank), tgt, sync=True)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_array_equal(np.asarray(mask), exp_mask)


@pytest.mark.parametrize("t,n,c,tgt", [(16, 3, 8, 7), (12, 5, 6, 12)])
def test_dpselect_async_matches_torch(rng, t, n, c, tgt):
    bank = rng.normal(size=(t, n, c)).astype(np.float32)
    exp_idx, exp_mask = oracle_keyframe_async(bank, tgt)
    idx, mask = dpselect.dpselect(jnp.asarray(bank), tgt, sync=False)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_array_equal(np.asarray(mask), exp_mask)


def test_dpselect_identity_when_ratio_one(rng):
    """Shipped configs use compression_ratio=1.0: all frames kept, in order,
    and the mask marks the dissimilarity peaks."""
    bank = rng.normal(size=(10, 2, 4)).astype(np.float32)
    idx, mask = dpselect.dpselect(jnp.asarray(bank), 10, sync=True)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(10))
    assert np.asarray(mask).any()


def oracle_malm(bank_np, tgt, sync, hard):
    bank = torch.from_numpy(bank_np)[None].clone()
    size = torch.ones_like(bank[:, :, :, 0])
    while bank.shape[1] > tgt:
        sim = F.cosine_similarity(bank[:, :-1], bank[:, 1:], dim=-1)
        if sync:
            sim = sim.mean(-1, keepdim=True).expand(-1, -1, bank.shape[2])
        _, mi = torch.max(sim, dim=1, keepdim=True)  # [1, 1, N]
        t = bank.shape[1]
        src = mi + 1
        dst = torch.arange(t - 1)[None, :, None].repeat(1, 1, bank.shape[2])
        dst[dst > mi] += 1
        c = bank.shape[-1]
        srcb = bank.gather(1, src.unsqueeze(-1).expand(-1, -1, -1, c))
        dstb = bank.gather(1, dst.unsqueeze(-1).expand(-1, -1, -1, c))
        if hard:
            dstb.scatter_(1, mi.unsqueeze(-1).expand(-1, -1, -1, c), srcb)
            bank = dstb
            size = size.gather(1, dst)
        else:
            ssz = size.gather(1, src)
            dsz = size.gather(1, dst)
            srcb = srcb * ssz.unsqueeze(-1)
            dstb = dstb * dsz.unsqueeze(-1)
            dstb.scatter_add_(1, mi.unsqueeze(-1).expand(-1, -1, -1, c), srcb)
            dsz.scatter_add_(1, mi, ssz)
            bank = dstb / dsz.unsqueeze(-1)
            size = dsz
    return bank[0].numpy()


@pytest.mark.parametrize("sync,hard", [(True, False), (True, True)])
def test_malm_sync_matches_torch(rng, sync, hard):
    bank = rng.normal(size=(9, 3, 5)).astype(np.float32)
    expected = oracle_malm(bank, 5, sync=sync, hard=hard)
    got = dpselect.malm_compress(jnp.asarray(bank), 5, sync=sync, hard=hard)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)
