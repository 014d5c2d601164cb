"""FHEKeyManager: real RLWE key material, encrypted at rest.

Re-implements /root/reference/key_management.py:23-268 with an essential
upgrade: the reference "generates FHE keys" by training+compiling a
Concrete model and can only persist its *config* (compiled circuits
aren't picklable — key_management.py:148-166); here key generation
produces actual RLWE secret/public/relinearization keys as arrays, all
serialized.  The secret key file is encrypted with a master-password-
derived Fernet key (PBKDF2-HMAC-SHA256, 100k iterations, 16-byte salt —
same KDF parameters as the reference, key_management.py:49-58); public
material is stored unencrypted.  File permissions 0600, metadata JSON
with a current-key pointer, rotation with grace periods — all parity.
"""

from __future__ import annotations

import base64
import getpass
import io
import json
import logging
import os
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from cryptography.fernet import Fernet, InvalidToken
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.kdf.pbkdf2 import PBKDF2HMAC

from .ops.cipher import KeySet, PublicKey, RelinKey, SecretKey
from .ops.runtime import FheRuntime

logger = logging.getLogger(__name__)

_KDF_ITERATIONS = 100_000


def _derive_fernet_key(password: str, salt: bytes) -> bytes:
    kdf = PBKDF2HMAC(algorithm=hashes.SHA256(), length=32, salt=salt,
                     iterations=_KDF_ITERATIONS)
    return base64.urlsafe_b64encode(kdf.derive(password.encode()))


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def _npz_load(raw: bytes) -> Dict[str, np.ndarray]:
    return dict(np.load(io.BytesIO(raw), allow_pickle=False))


class FHEKeyManager:
    def __init__(self, key_dir: str = "~/.fhe_keys",
                 preset: str = "pairwise-4096"):
        self.key_dir = Path(key_dir).expanduser()
        self.key_dir.mkdir(parents=True, exist_ok=True, mode=0o700)
        self.preset = preset
        self.meta_path = self.key_dir / "metadata.json"
        self._fernet: Optional[Fernet] = None

    # -- master password ---------------------------------------------------
    def _get_master_key(self) -> Fernet:
        """Derive (and verify) the Fernet key from the master password.

        Password sources, in order: FHE_MASTER_PASSWORD env var (tests,
        as in /root/reference/test_e2e_simple.py:6), interactive getpass.
        A stored test token (reference key_management.py:77-105) verifies
        correctness and raises ValueError on mismatch.
        """
        if self._fernet is not None:
            return self._fernet
        password = os.environ.get("FHE_MASTER_PASSWORD")
        if password is None:
            password = getpass.getpass("Master password: ")
        salt_path = self.key_dir / "salt.bin"
        token_path = self.key_dir / "verify.token"
        if not salt_path.exists():
            salt = os.urandom(16)
            salt_path.write_bytes(salt)
            os.chmod(salt_path, 0o600)
            f = Fernet(_derive_fernet_key(password, salt))
            token_path.write_bytes(f.encrypt(b"fhe-icp-tpu-verify"))
            os.chmod(token_path, 0o600)
        else:
            salt = salt_path.read_bytes()
            f = Fernet(_derive_fernet_key(password, salt))
            try:
                if f.decrypt(token_path.read_bytes()) != b"fhe-icp-tpu-verify":
                    raise ValueError("master password verification failed")
            except InvalidToken:
                raise ValueError("incorrect master password")
        self._fernet = f
        return f

    # -- metadata ----------------------------------------------------------
    def _load_meta(self) -> Dict:
        if self.meta_path.exists():
            return json.loads(self.meta_path.read_text())
        return {"keys": {}, "current": None}

    def _save_meta(self, meta: Dict) -> None:
        self.meta_path.write_text(json.dumps(meta, indent=2))
        os.chmod(self.meta_path, 0o600)

    # -- key generation ----------------------------------------------------
    def generate_keys(self, key_id: Optional[str] = None,
                      seed: Optional[int] = None) -> str:
        t0 = time.time()
        key_id = key_id or f"fhe_key_{int(time.time())}"
        seed = seed if seed is not None else int.from_bytes(
            os.urandom(4), "little")
        f = self._get_master_key()

        rt = FheRuntime(self.preset)
        ks = rt.generate_keys(seed=seed)

        sk_raw = _npz_bytes(
            s=np.asarray(ks.sk.s),
            s_ntt_mont=np.asarray(ks.sk.s_ntt_mont),
            s2_ntt_mont=np.asarray(ks.sk.s2_ntt_mont),
        )
        sk_path = self.key_dir / f"{key_id}.sk.enc"
        sk_path.write_bytes(f.encrypt(sk_raw))
        os.chmod(sk_path, 0o600)

        pub_arrays = {"pk_b": np.asarray(ks.pk.b_ntt),
                      "pk_a": np.asarray(ks.pk.a_ntt)}
        for lv, rk in ks.rlk.keys.items():
            pub_arrays[f"rlk_{lv}"] = np.asarray(rk)
        pub_path = self.key_dir / f"{key_id}.pub"
        pub_path.write_bytes(_npz_bytes(**pub_arrays))
        os.chmod(pub_path, 0o600)

        meta = self._load_meta()
        meta["keys"][key_id] = {
            "created_at": time.time(),
            "preset": self.preset,
            "seed_fingerprint": hex(hash(seed) & 0xFFFFFFFF),
            "status": "active",
            "generation_time_s": time.time() - t0,
        }
        meta["current"] = key_id
        self._save_meta(meta)
        logger.info("generated key %s in %.2fs", key_id, time.time() - t0)
        return key_id

    # -- key access --------------------------------------------------------
    def list_keys(self) -> List[str]:
        return sorted(self._load_meta()["keys"])

    def get_current_key(self) -> Optional[str]:
        return self._load_meta()["current"]

    def key_info(self, key_id: str) -> Dict:
        """Metadata for one key, including on-disk artifact size
        (reference fhe_cli.py:64 displays size_bytes in `keys list`)."""
        info = dict(self._load_meta()["keys"][key_id])
        size = 0
        for path in (self.key_dir / f"{key_id}.sk.enc",
                     self.key_dir / f"{key_id}.pub"):
            if path.exists():
                size += path.stat().st_size
        info["size_bytes"] = size
        return info

    def load_keyset(self, key_id: Optional[str] = None,
                    runtime: Optional[FheRuntime] = None) -> FheRuntime:
        """Load keys into a runtime (decrypting the secret key at rest)."""
        import jax.numpy as jnp
        key_id = key_id or self.get_current_key()
        if key_id is None:
            raise RuntimeError("no keys generated yet")
        meta = self._load_meta()["keys"].get(key_id)
        if meta is None:
            raise KeyError(f"unknown key {key_id!r}")
        f = self._get_master_key()
        sk_raw = f.decrypt((self.key_dir / f"{key_id}.sk.enc").read_bytes())
        sk_arrays = _npz_load(sk_raw)
        pub_arrays = _npz_load((self.key_dir / f"{key_id}.pub").read_bytes())

        rt = runtime or FheRuntime(meta.get("preset", self.preset))
        sk = SecretKey(
            s=jnp.asarray(sk_arrays["s"]),
            s_ntt_mont=jnp.asarray(sk_arrays["s_ntt_mont"]),
            s2_ntt_mont=jnp.asarray(sk_arrays["s2_ntt_mont"]),
        )
        pk = PublicKey(b_ntt=jnp.asarray(pub_arrays["pk_b"]),
                       a_ntt=jnp.asarray(pub_arrays["pk_a"]))
        rlk = RelinKey(keys={
            int(k.split("_")[1]): jnp.asarray(v)
            for k, v in pub_arrays.items() if k.startswith("rlk_")})
        rt.keys = KeySet(sk=sk, pk=pk, rlk=rlk)
        return rt

    # -- homomorphic re-keying (old key -> new key, no decryption) ----------
    def _rekey_path(self, old_key_id: str, new_key_id: str) -> Path:
        return self.key_dir / f"rekey_{old_key_id}__to__{new_key_id}.npz"

    def make_rekey_key(self, old_key_id: str,
                       new_key_id: Optional[str] = None) -> Path:
        """Generate + persist keyswitch keys old -> new (public material).

        Requires the master password (both secret keys are decrypted to
        build the keys), but the resulting file is public-key material —
        it is stored unencrypted like `.pub`.  Beats the reference's
        rotation scheme, which can only keep old keys loadable for a
        grace period (/root/reference/key_management.py:243-268); here
        the store itself migrates (see batch.rekey_store).
        """
        import jax
        from .ops.cipher import rekey_keygen
        new_key_id = new_key_id or self.get_current_key()
        if new_key_id is None:
            raise RuntimeError("no current key to rekey to")
        old_rt = self.load_keyset(old_key_id)
        new_rt = self.load_keyset(new_key_id)
        ctx = new_rt.ctx
        seed = int.from_bytes(os.urandom(8), "little") >> 1
        ksks = jax.jit(lambda k: rekey_keygen(
            ctx, k, old_rt.keys.sk, new_rt.keys.sk))(jax.random.PRNGKey(seed))
        path = self._rekey_path(old_key_id, new_key_id)
        path.write_bytes(_npz_bytes(
            **{f"ksk_{lv}": np.asarray(v) for lv, v in ksks.items()}))
        os.chmod(path, 0o600)
        logger.info("rekey key %s -> %s written", old_key_id, new_key_id)
        return path

    def load_rekey_key(self, old_key_id: str,
                       new_key_id: Optional[str] = None) -> Dict:
        """{level: ksk array} for old -> new, generating it if absent."""
        import jax.numpy as jnp
        new_key_id = new_key_id or self.get_current_key()
        path = self._rekey_path(old_key_id, new_key_id)
        if not path.exists():
            self.make_rekey_key(old_key_id, new_key_id)
        arrays = _npz_load(path.read_bytes())
        return {int(k.split("_")[1]): jnp.asarray(v)
                for k, v in arrays.items()}

    # -- rotation ----------------------------------------------------------
    def rotate_keys(self, grace_period_days: int = 7) -> str:
        meta = self._load_meta()
        old = meta.get("current")
        new_id = self.generate_keys()
        if old and old in self._load_meta()["keys"]:
            meta = self._load_meta()
            meta["keys"][old]["status"] = "rotated"
            meta["keys"][old]["rotated_at"] = time.time()
            meta["keys"][old]["grace_until"] = (
                time.time() + grace_period_days * 86400)
            self._save_meta(meta)
        return new_id

    def get_stats(self) -> Dict:
        meta = self._load_meta()
        return {
            "key_count": len(meta["keys"]),
            "current_key": meta["current"],
            "key_dir": str(self.key_dir),
            "preset": self.preset,
        }
