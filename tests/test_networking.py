"""Loopback multiplayer session tests (SURVEY.md §4d).

Each test spins real UDP sockets on an ephemeral port: first peer elects
itself host (no pong), later peers join as clients with assigned ids —
the reference's exact session behavior (Networking.cs:71-184, 429-475).
"""

import socket
import time

import pytest

from softwarerenderer_tpu.io_host.networking import Networking


def free_port():
    with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def wait_for(pred, timeout=3.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.01)
    return False


@pytest.fixture
def port():
    return free_port()


def make_peer(port, client=False, **kw):
    """Create a peer.  client=True joins with client_only handshakes
    (retried): under CPU load the election pong can miss the 0.3 s
    window and the peer would otherwise SELF-ELECT a second host on the
    session port — reference-faithful in production, but a setup race
    in tests that assume the join succeeded (flaked the migration tests
    ~3/5 under a contended box)."""
    n = Networking()
    for k, v in kw.items():
        setattr(n, k, v)
    if client:
        for timeout in (0.3, 1.0, 3.0):
            if n.connect("127.0.0.1", port, handshake_timeout=timeout,
                         client_only=True):
                break
        else:
            raise AssertionError("client join failed: no host answered")
    else:
        assert n.connect("127.0.0.1", port, handshake_timeout=0.3)
    return n


def test_host_election_and_id_assignment(port):
    host = make_peer(port)
    assert host.is_host and host.client_id == 0
    c1 = make_peer(port, client=True)
    c2 = make_peer(port, client=True)
    try:
        assert not c1.is_host and c1.client_id == 1
        assert not c2.is_host and c2.client_id == 2
        assert len(host.connected_clients) == 2
    finally:
        c2.close(); c1.close(); host.close()


def test_host_broadcast_reaches_clients_and_self(port):
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        host.send_rpc("ChatMessage", ["server", "hello"])
        assert wait_for(lambda: any(
            m == "ChatMessage" for m, p, s in client.poll_rpcs()))
        # local echo on the host (Networking.cs:284)
        assert any(m == "ChatMessage" and p == ["server", "hello"]
                   for m, p, s in host.poll_rpcs())
    finally:
        client.close(); host.close()


def test_client_rpc_reaches_host_with_sender_id(port):
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        client.send_rpc("Update", ["1", "0", "0", "0"])
        got = []
        assert wait_for(lambda: got.extend(
            x for x in host.poll_rpcs() if x[0] == "Update") or got)
        method, params, sender = got[0]
        # Faithful quirk: the HOST does not strip the senderId suffix before
        # invoking handlers (Networking.cs:395-407 strips only when !IsHost),
        # so it arrives as a trailing parameter.
        assert params == ["1", "0", "0", "0",
                          f"senderId={client.client_id}"]
        assert sender == client.client_id
    finally:
        client.close(); host.close()


def test_no_client_to_client_relay_by_default(port):
    """Faithful quirk: the host does not relay client RPCs."""
    host = make_peer(port)
    c1 = make_peer(port, client=True)
    c2 = make_peer(port, client=True)
    try:
        c1.send_rpc("ChatMessage", ["c1", "hi"])
        time.sleep(0.5)
        assert not any(m == "ChatMessage" for m, p, s in c2.poll_rpcs())
    finally:
        c2.close(); c1.close(); host.close()


def test_relay_mode_fixes_topology(port):
    host = make_peer(port, relay_client_rpcs=True)
    c1 = make_peer(port, client=True)
    c2 = make_peer(port, client=True)
    try:
        c1.send_rpc("ChatMessage", ["c1", "hi"])
        got = []
        assert wait_for(lambda: got.extend(
            x for x in c2.poll_rpcs() if x[0] == "ChatMessage") or got)
        method, params, sender = got[0]
        assert params == ["c1", "hi"]
        assert sender == c1.client_id   # senderId travels on the relay
    finally:
        c2.close(); c1.close(); host.close()


def test_buffered_rpcs_replay_to_late_joiner(port):
    host = make_peer(port)
    host.send_rpc("ConnectedPlayer", ["0", "HostPlayer"], buffer_rpc=True)
    late = make_peer(port, client=True)
    try:
        got = []
        assert wait_for(lambda: got.extend(
            x for x in late.poll_rpcs() if x[0] == "ConnectedPlayer") or got)
        assert got[0][1] == ["0", "HostPlayer"]
    finally:
        late.close(); host.close()


def test_disconnect_broadcasts_client_disconnected(port):
    host = make_peer(port)
    c1 = make_peer(port, client=True)
    c2 = make_peer(port, client=True)
    cid = c1.client_id
    try:
        c1.close()  # sends Disconnect RPC
        got = []
        assert wait_for(lambda: got.extend(
            x for x in c2.poll_rpcs() if x[0] == "ClientDisconnected") or got)
        assert got[0][1] == [str(cid)]
        assert wait_for(lambda: len(host.connected_clients) == 1)
    finally:
        c2.close(); host.close()


def test_reconnect_updates_endpoint(port):
    host = make_peer(port)
    c1 = make_peer(port, client=True)
    cid = c1.client_id
    old_ep = list(host.connected_clients.keys())[0]
    try:
        # Simulate the client pinging from a new endpoint with its known id.
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
            s.bind(("127.0.0.1", 0))
            s.sendto(f"RPC:Ping:{cid}".encode(), ("127.0.0.1", port))
            new_ep = s.getsockname()
            assert wait_for(lambda: host.connected_clients.get(
                ("127.0.0.1", new_ep[1])) == cid)
        assert old_ep not in host.connected_clients
    finally:
        c1.close(); host.close()


def test_callback_delivery(port):
    host = make_peer(port)
    events = []
    host.on_receive_rpc.append(lambda m, p: events.append((m, p)))
    client = make_peer(port, client=True)
    try:
        client.send_rpc("Shoot", ["1", "2", "3"])
        assert wait_for(lambda: any(m == "Shoot" for m, p in events))
    finally:
        client.close(); host.close()


def test_host_timeout_detection(port):
    host = make_peer(port, peer_timeout=0.5)
    client = make_peer(port, client=True, peer_timeout=0.5)
    try:
        lost = []
        client.on_host_lost.append(lambda: lost.append(True))
        # silence the host (kill its socket without Disconnect)
        host._running = False
        host._sock.close(); host._sock = None
        assert wait_for(lambda: client.host_lost, timeout=2.0)
        assert lost
    finally:
        client.close(send_disconnect=False)
        host._recv_thread = None


def test_client_timeout_expires_and_broadcasts(port):
    host = make_peer(port, peer_timeout=0.5)
    c1 = make_peer(port, client=True)
    c2 = make_peer(port, client=True)
    cid = c1.client_id
    try:
        # c1 vanishes silently (no Disconnect RPC)
        c1._running = False
        c1._sock.close(); c1._sock = None
        # keep traffic flowing so the host's check runs
        def chatter():
            c2.send_rpc("Update", ["x"])
        got = []
        t0 = time.time()
        while time.time() - t0 < 3.0 and not got:
            chatter()
            got.extend(x for x in c2.poll_rpcs()
                       if x[0] == "ClientDisconnected")
            time.sleep(0.05)
        assert got and got[0][1][0] == str(cid)
        assert cid not in host.connected_clients.values()
    finally:
        c2.close(); host.close()


def test_fault_injection_drops_packets(port):
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        host.drop_rate = 1.0   # drop everything outbound
        for _ in range(5):
            host.send_rpc("ChatMessage", ["s", "dropped"])
        time.sleep(0.3)
        assert not any(m == "ChatMessage" for m, p, s in client.poll_rpcs())
        host.drop_rate = 0.0
        host.send_rpc("ChatMessage", ["s", "arrives"])
        assert wait_for(lambda: any(
            m == "ChatMessage" for m, p, s in client.poll_rpcs()))
    finally:
        client.close(); host.close()


def test_reliable_rpc_survives_heavy_loss(port):
    """reliable=True resends until acked: a 75%-loss link still delivers
    the RPC exactly once in each direction (beyond the reference's
    at-most-once UDP)."""
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        host.resend_interval = client.resend_interval = 0.05
        host.drop_rate = client.drop_rate = 0.75
        host.send_rpc("MapChange", ["de_dust2"], reliable=True)
        client.send_rpc("Loadout", ["ak47"], reliable=True)
        got_c, got_h = [], []
        wait_for(lambda: (
            got_c.extend(x for x in client.poll_rpcs()
                         if x[0] == "MapChange") or
            got_h.extend(x for x in host.poll_rpcs()
                         if x[0] == "Loadout" and x[2] == client.client_id)
            or (got_c and got_h)), timeout=15.0)
        assert len(got_c) == 1 and got_c[0][1] == ["de_dust2"]
        # host keeps the trailing senderId param (faithful reference
        # behavior); the seq tag must be stripped though
        assert len(got_h) == 1 and got_h[0][1][0] == "ak47"
        assert not any(p.startswith("seq=") for p in got_h[0][1])
        host.drop_rate = client.drop_rate = 0.0
        # pending tables drain once acks get through
        wait_for(lambda: not host._pending and not client._pending,
                 timeout=10.0)
        assert not host._pending and not client._pending
    finally:
        client.close()
        host.close()


def test_reliable_rpc_exactly_once_despite_resends(port):
    """Dropped ACKs force resends; the receiver must dedup (deliver once,
    ack every copy)."""
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        host.resend_interval = 0.05
        client.drop_rate = 1.0        # client's acks all drop
        host.send_rpc("RoundStart", ["1"], reliable=True)
        got = []
        wait_for(lambda: got.extend(
            x for x in client.poll_rpcs() if x[0] == "RoundStart") or got)
        time.sleep(0.5)               # several resend periods elapse
        got.extend(x for x in client.poll_rpcs() if x[0] == "RoundStart")
        assert len(got) == 1          # duplicates suppressed
        assert host._pending          # unacked: still pending
        client.drop_rate = 0.0        # acks flow again
        wait_for(lambda: not host._pending, timeout=10.0)
    finally:
        client.close()
        host.close()


def test_reliable_gives_up_after_max_attempts(port):
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        host.resend_interval = 0.02
        host.max_resend_attempts = 3
        host.drop_rate = 1.0          # nothing ever arrives
        host.send_rpc("Never", [], reliable=True)
        wait_for(lambda: not host._pending, timeout=10.0)
        assert not host._pending
    finally:
        client.close()
        host.close()


def test_delivery_failure_callback_fires(port):
    """A partitioned peer exhausts the resend budget: on_delivery_failed
    must report the seq and the unacked targets (not just a debug log)."""
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        failures = []
        host.on_delivery_failed.append(
            lambda seq, targets: failures.append((seq, set(targets))))
        host.resend_interval = 0.02
        host.max_resend_attempts = 3
        host.drop_rate = 1.0          # full partition
        host.send_rpc("Never", [], reliable=True)
        wait_for(lambda: failures, timeout=10.0)
        assert len(failures) == 1
        seq, targets = failures[0]
        assert seq == 1 and len(targets) == 1
    finally:
        client.close()
        host.close()


def test_acks_coalesce_under_burst(port):
    """A burst of reliable RPCs produces a few coalesced "ack:s1,s2,…"
    datagrams, not one ack datagram per receipt (~10× fewer on a
    30-message burst)."""
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        acks = []
        orig = client._send_raw

        def counting(data, target=None):
            if data.startswith(b"ack:"):
                acks.append(data)
            return orig(data, target)

        client._send_raw = counting
        host.resend_interval = 0.5    # no resend noise during the burst
        for i in range(30):
            host.send_rpc("Tick", [str(i)], reliable=True)
        got = []
        assert wait_for(lambda: got.extend(
            x for x in client.poll_rpcs() if x[0] == "Tick")
            or len(got) >= 30, timeout=5.0)
        assert wait_for(lambda: not host._pending, timeout=5.0)
        # every receipt acked, but coalesced: ≥30 seqs in ≤6 datagrams
        assert sum(len(a[4:].split(b",")) for a in acks) >= 30
        assert len(acks) <= 6
    finally:
        client.close()
        host.close()


def test_reliable_state_resets_on_reconnect(port):
    """ADVICE r2: after a host restart, the peer's reused low seq numbers
    must not be dropped as stale duplicates — close()/connect() clear the
    reliable-delivery state (seq counter, pending table, seen-seq sets)."""
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        host.send_rpc("Phase", ["1"], reliable=True)
        assert wait_for(lambda: any(x[0] == "Phase"
                                    for x in client.poll_rpcs()))
        assert client._seen_seqs
        host.close()
        host = make_peer(port)        # restarted host: seq counter at 1
        client.close()
        assert not client._seen_seqs and client._send_seq == 0 \
            and not client._pending
        assert client.connect("127.0.0.1", port, handshake_timeout=0.3)
        host.send_rpc("Phase", ["2"], reliable=True)   # seq 1 AGAIN
        got = []
        assert wait_for(lambda: got.extend(
            x for x in client.poll_rpcs()
            if x[0] == "Phase" and x[1] == ["2"]) or got)
    finally:
        client.close()
        host.close()


def test_heartbeats_keep_idle_session_alive(port):
    """peer_timeout keepalives: an idle-but-alive session must never
    read as a dead one (failure detection is traffic-independent)."""
    host = make_peer(port, peer_timeout=0.4)
    client = make_peer(port, client=True, peer_timeout=0.4)
    try:
        time.sleep(1.5)               # several timeout periods, no traffic
        assert not client.host_lost
        assert len(host.connected_clients) == 1
    finally:
        client.close()
        host.close()


def test_host_migration_elects_lowest_id(port):
    """Elastic recovery (SURVEY §5): the host vanishes silently; the
    lowest-id client rebinds the session port as the new host, the other
    client rejoins it, and RPCs flow in the new session."""
    host = make_peer(port)
    c1 = make_peer(port, client=True, enable_host_migration=True, peer_timeout=0.5)
    c2 = make_peer(port, client=True, enable_host_migration=True, peer_timeout=0.5)
    migrated = []
    c1.on_migrated.append(lambda is_host: migrated.append(("c1", is_host)))
    c2.on_migrated.append(lambda is_host: migrated.append(("c2", is_host)))
    try:
        assert c1.client_id == 1 and c2.client_id == 2
        # the roster reaches both clients on join
        assert wait_for(lambda: len(c1.known_peers) >= 2
                        and len(c2.known_peers) >= 2)
        host.close(send_disconnect=False)          # vanish silently
        assert wait_for(lambda: c1.is_host, timeout=10.0)
        assert wait_for(lambda: (not c2.is_host) and c2.is_connected
                        and c2.client_id > 0 and not c2._migrating,
                        timeout=10.0)
        assert wait_for(lambda: len(c1.connected_clients) == 1,
                        timeout=5.0)
        assert ("c1", True) in migrated and ("c2", False) in migrated
        # the new session carries traffic
        c1.send_rpc("Hello", ["again"])
        got = []
        assert wait_for(lambda: got.extend(
            x for x in c2.poll_rpcs() if x[0] == "Hello") or got,
            timeout=5.0)
        assert got[0][1] == ["again"]
    finally:
        c2.close()
        c1.close()


def test_migration_without_roster_never_self_elects(port):
    """Election safety: a client whose __PeerList never arrived cannot
    know whether a lower id exists — it must only retry the old host,
    then surface failure, NEVER bind a second session."""
    host = make_peer(port)
    c1 = make_peer(port, client=True, enable_host_migration=True, peer_timeout=0.4,
                   migration_attempts=2, migration_grace=0.1)
    failed = []
    c1.on_migration_failed.append(lambda: failed.append(True))
    try:
        # Wait for the join-time __PeerList to actually ARRIVE before
        # dropping it: clearing too early races an in-flight delivery
        # that repopulates the roster, after which self-election is the
        # CORRECT behavior (this flaked ~3/5 under a loaded box).  After
        # the host closes nothing can rebroadcast, so the drop sticks.
        assert wait_for(lambda: c1.known_peers, timeout=5.0)
        host.close(send_disconnect=False)
        c1.known_peers = {}          # the roster datagram "was dropped"
        # generous bound: the 0.4 s peer timeout + 2 retry attempts can
        # stretch when the whole suite loads the box (seen >10 s once)
        assert wait_for(lambda: failed, timeout=30.0)
        assert not c1.is_host
        assert c1.migration_failed and not c1.is_connected
    finally:
        c1.close()
        host.close()


def test_migration_skips_dead_candidate(port):
    """If the lowest-id peer died with the host, the next survivor takes
    over after exhausting it."""
    host = make_peer(port)
    c1 = make_peer(port, client=True)                                  # id 1
    c2 = make_peer(port, client=True, enable_host_migration=True, peer_timeout=0.5,
                   migration_attempts=4, migration_grace=0.1)  # id 2
    try:
        assert wait_for(lambda: len(c2.known_peers) >= 2)
        # kill c1 AND the host silently (no Disconnect → roster keeps c1)
        c1._running = False
        c1._sock.close(); c1._sock = None
        host.close(send_disconnect=False)
        assert wait_for(lambda: c2.is_host, timeout=15.0)
    finally:
        c2.close()
        c1._recv_thread = None
        host.close()


def test_rpc_batching_coalesces_datagrams(port):
    """With rpc_batch_window set, a burst of RPCs rides a few "BAT:"
    container datagrams instead of one datagram each — and every message
    still arrives, in order."""
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        client.rpc_batch_window = 0.05
        base = client.datagrams_sent
        for i in range(20):
            client.send_rpc("Tick", [str(i)])
        got = []
        assert wait_for(lambda: got.extend(
            x for x in host.poll_rpcs() if x[0] == "Tick")
            or len(got) >= 20, timeout=5.0)
        assert [g[1][0] for g in got] == [str(i) for i in range(20)]
        # 20 RPCs in a handful of datagrams (incl. any heartbeat noise).
        assert client.datagrams_sent - base <= 5
    finally:
        client.close()
        host.close()


def test_rpc_batching_reliable_and_host_broadcast(port):
    """Reliable RPCs batch on first transmission and still converge to
    exactly-once; host broadcasts batch per destination."""
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        host.rpc_batch_window = 0.05
        for i in range(10):
            host.send_rpc("Beat", [str(i)], reliable=True)
        got = []
        assert wait_for(lambda: got.extend(
            x for x in client.poll_rpcs() if x[0] == "Beat")
            or len(got) >= 10, timeout=5.0)
        assert wait_for(lambda: not host._pending, timeout=5.0)
        assert sorted(int(g[1][0]) for g in got) == list(range(10))
    finally:
        client.close()
        host.close()


def test_rpc_batching_respects_mtu_cap(port):
    """A queued batch nearing batch_max_chars flushes immediately in
    MTU-sized container chunks rather than growing one huge datagram."""
    host = make_peer(port)
    client = make_peer(port, client=True)
    try:
        client.rpc_batch_window = 10.0    # window never expires on its own
        payload = "x" * 300
        base = client.datagrams_sent
        for i in range(8):                # ~2.4 kchars >> 1200-char cap
            client.send_rpc("Blob", [str(i), payload])
        got = []
        assert wait_for(lambda: got.extend(
            x for x in host.poll_rpcs() if x[0] == "Blob")
            or len(got) >= 8, timeout=5.0)
        sent = client.datagrams_sent - base
        assert 2 <= sent <= 4             # chunked, not 8 and not 1
    finally:
        client.close()
        host.close()


def test_split_batch_roundtrip_and_malformed():
    from softwarerenderer_tpu.io_host.networking import _split_batch
    msgs = ["RPC:A:1", "RPC:B:héllo:wörld", "RPC:C"]
    body = "".join(f"{len(m)}:{m}" for m in msgs)
    assert _split_batch(body) == msgs
    with pytest.raises((ValueError, IndexError)):
        _split_batch("999:short")
    with pytest.raises((ValueError, IndexError)):
        _split_batch("abc")


def test_timeout_expiry_prunes_buffered_relayed_joins(port):
    """Regression (dedicated-server ghosts): a client that CRASHES (no
    Disconnect RPC) must have its buffered relayed join pruned by the
    heartbeat timeout path, exactly like a graceful disconnect — late
    joiners must not resurrect it."""
    host = make_peer(port, peer_timeout=0.5, relay_client_rpcs=True,
                     buffer_relayed_methods={"ConnectedPlayer"})
    c1 = make_peer(port, client=True)
    cid = c1.client_id
    try:
        c1.send_rpc("ConnectedPlayer", [str(cid), "Ghost"])
        assert wait_for(lambda: len(host._buffered_rpcs) == 1, timeout=2.0)
        # c1 crashes silently
        c1._running = False
        c1._sock.close(); c1._sock = None
        assert wait_for(lambda: cid not in
                        host.connected_clients.values(), timeout=3.0)
        assert host._buffered_rpcs == [], "ghost join survived the timeout"
    finally:
        host.close()


def test_idle_client_reciprocates_heartbeats(port):
    """Regression: an idle-but-alive client with peer_timeout == 0 (no
    failure detection of its own) must ANSWER a failure-detecting
    host's keepalives so it is never expired as dead — the dedicated
    relay server expired a client whose app was busy loading assets for
    45 s, pruning its buffered join before the next player arrived."""
    host = make_peer(port, peer_timeout=0.6, relay_client_rpcs=True,
                     buffer_relayed_methods={"ConnectedPlayer"})
    c1 = make_peer(port, client=True)          # peer_timeout stays 0
    cid = c1.client_id
    try:
        c1.send_rpc("ConnectedPlayer", [str(cid), "Alice"])
        assert wait_for(lambda: len(host._buffered_rpcs) == 1, timeout=2.0)
        # c1 goes app-idle (sends nothing) for >> host.peer_timeout; its
        # receive thread must keep it alive via reciprocal "hb".
        time.sleep(2.5)
        assert cid in host.connected_clients.values(), \
            "idle client was expired despite reciprocal keepalives"
        assert len(host._buffered_rpcs) == 1, "buffered join was pruned"
        # a late joiner still receives the buffered join
        c2 = make_peer(port, client=True)
        try:
            assert wait_for(lambda: any(
                m == "ConnectedPlayer" and p[:2] == [str(cid), "Alice"]
                for m, p, _ in c2.poll_rpcs()), timeout=2.0)
        finally:
            c2.close()
    finally:
        c1.close()
        host.close()


def test_direct_host_refuses_occupied_port(port):
    """host() binds without SO_REUSEADDR: a second direct host on the
    same UDP port must FAIL instead of silently double-binding (two
    'hosts' splitting the session's datagrams)."""
    a = Networking()
    a.log = lambda s: None
    assert a.host(port)
    b = Networking()
    b.log = lambda s: None
    try:
        assert not b.host(port)
        assert not b.is_connected
        # the original host still answers elections
        c = make_peer(port, client=True)
        c.close()
    finally:
        a.close()
        b.close()
