"""KmsTransport seam (VERDICT r3 item 8): the service/transport split
mirroring the reference's Service.java over VaultClientImpl.java. A real
Vault/AWS/GCP client drops in by implementing the five transport ops;
the SERVICE maps transport faults to the engine's retriable-vs-fatal
taxonomy (C3), which the pipeline's O10 routing then consumes — proven
end-to-end with a flaky transport that recovers under epoch retry."""

from __future__ import annotations

import os

import pytest

from cdcrypt.envelope import decrypt_batch, encrypt_batch
from cdcrypt.errors import ClientErrorException, ServerErrorException
from cdcrypt.kms import (
    FaultInjectingTransport,
    InProcessKmsTransport,
    KmsTransport,
    KmsTransportError,
    MockKMS,
)


class CountingTransport(InProcessKmsTransport):
    """Delegating fake: proves every service op flows through the seam."""

    def __init__(self):
        super().__init__()
        self.ops = []

    def generate_data_key(self, key_id, context=None):
        self.ops.append("gdk")
        return super().generate_data_key(key_id, context)

    def unwrap(self, wrapped, key_id, context=None):
        self.ops.append("unwrap")
        return super().unwrap(wrapped, key_id, context)

    def derive_deterministic_dek(self, key_id, context=None):
        self.ops.append("det")
        return super().derive_deterministic_dek(key_id, context)

    def fetch_public_pem(self, key_id):
        self.ops.append("pem")
        return super().fetch_public_pem(key_id)

    def asym_unwrap(self, wrapped, key_id):
        self.ops.append("asym")
        return super().asym_unwrap(wrapped, key_id)


class FailingTransport:
    """Transport that always raises with a configured status."""

    def __init__(self, status=None, retriable=None):
        self.status, self.retriable = status, retriable

    def _boom(self, *_a, **_k):
        raise KmsTransportError("injected transport fault",
                                status=self.status,
                                retriable=self.retriable)

    generate_data_key = unwrap = derive_deterministic_dek = _boom
    fetch_public_pem = asym_unwrap = _boom


def test_every_service_op_flows_through_the_transport():
    t = CountingTransport()
    kms = MockKMS(transport=t)
    assert isinstance(t, KmsTransport)  # protocol conformance
    vals = ["hello", None, "world"]
    env = encrypt_batch(vals, "k/seam", kms)
    assert decrypt_batch(env, kms) == vals
    det = encrypt_batch(vals, "k/seam", kms, deterministic=True)
    assert decrypt_batch(det, kms) == vals
    pem = kms.asym_public_pem("k/seam")
    asym = encrypt_batch(vals, "k/seam", kms, public_key_pem=pem)
    assert decrypt_batch(asym, kms) == vals
    assert {"gdk", "unwrap", "det", "pem", "asym"} <= set(t.ops)


def test_transport_error_mapping_is_the_reference_status_split():
    # VaultClientImpl.java:100-106 — 4xx client/fatal, else server/retriable
    with pytest.raises(ServerErrorException, match="retriable"):
        MockKMS(transport=FailingTransport(status=503)).generate_data_key("k")
    with pytest.raises(ClientErrorException, match="status=400"):
        MockKMS(transport=FailingTransport(status=400)).generate_data_key("k")
    # a status-less fault (timeout / reset) must be retriable
    with pytest.raises(ServerErrorException):
        MockKMS(transport=FailingTransport()).unwrap(b"x" * 44, "k")
    # the explicit flag overrides the status heuristic
    with pytest.raises(ClientErrorException):
        MockKMS(transport=FailingTransport(status=500, retriable=False)) \
            .derive_deterministic_dek("k")
    # typed engine errors raised by a transport pass through unmapped
    with pytest.raises(ClientErrorException, match="malformed"):
        MockKMS().unwrap(b"short", "k")


def test_transient_transport_fault_recovers_under_epoch_retry(
        spark, tmp_path):
    """C3-at-the-transport-layer, end-to-end: a transient transport fault
    surfaces as a retriable server error, the pipeline replays the epoch,
    and the final table state is correct (idempotent sink makes the
    replay exactly-once)."""
    from cdcrypt.operators.transform import decrypt_fields
    from cdcrypt.sources.changegen import GenSpec, generate_to_dir
    from cdcrypt.streaming.pipeline import IngestPipeline
    from cdcrypt.table.lake import LakeTable

    stream_dir = str(tmp_path / "stream")
    generate_to_dir(stream_dir,
                    GenSpec(n_convs=20, avg_turns=4, n_epochs=2, seed=11))
    kms = MockKMS(transport=FaultInjectingTransport(
        once_marker=str(tmp_path / "marker")))
    p = IngestPipeline(stream_dir, str(tmp_path / "t"), str(tmp_path / "c"),
                       key_id="k/flaky", kms=kms, bucket_count=4,
                       max_retries=2)
    p.run(spark)
    assert os.path.exists(str(tmp_path / "marker"))  # the fault really hit
    t = LakeTable(str(tmp_path / "t"))
    rows = t.read(spark)
    dec = decrypt_fields(rows, ["$.text"], key_id="k/flaky", kms=kms,
                         aad_field="conv_id")
    assert dec.where("text IS NOT NULL").count() > 0

    # a fatal transport fault aborts instead of retrying
    p2 = IngestPipeline(stream_dir, str(tmp_path / "t2"),
                        str(tmp_path / "c2"), key_id="k/fatal",
                        kms=MockKMS(transport=FaultInjectingTransport(status=403)),
                        bucket_count=4, max_retries=3)
    with pytest.raises(Exception, match="ClientErrorException|status=403"):
        p2.run(spark, max_epochs=1)
