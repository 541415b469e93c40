"""UPnP IGD client tests against a loopback fake gateway.

The reference maps its session port via Open.NAT when it becomes host
(/root/reference/Networking.cs:32-69) and unmaps on close (:550).
These tests stand up a fake IGD — an SSDP unicast responder plus an
HTTP server serving a device description and answering SOAP control
POSTs — entirely on 127.0.0.1, and drive the first-party client
(io_host/upnp.py) and its Networking integration through it.
"""

import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.etree import ElementTree

import pytest

from softwarerenderer_tpu.io_host import upnp
from softwarerenderer_tpu.io_host.networking import Networking

WAN_IP_1 = "urn:schemas-upnp-org:service:WANIPConnection:1"


def _localname(tag):
    return tag.rsplit("}", 1)[-1]


class FakeIGD:
    """A loopback IGD: answers M-SEARCH, serves desc.xml, runs SOAP."""

    def __init__(self, external_ip="203.0.113.7", fail_add=False):
        self.external_ip = external_ip
        self.fail_add = fail_add
        self.mappings = {}          # (proto, ext_port) -> dict of args
        self.soap_actions = []      # every action name received, in order

        igd = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):       # silence request logging
                pass

            def do_GET(self):
                if self.path != "/desc.xml":
                    self.send_error(404)
                    return
                body = igd._description().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/xml")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/ctl":
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n).decode()
                action = (self.headers.get("SOAPACTION", "")
                          .strip('"').rsplit("#", 1)[-1])
                status, resp = igd._soap(action, body)
                data = resp.encode()
                self.send_response(status)
                self.send_header("Content-Type", "text/xml")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.http = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.http_port = self.http.server_address[1]
        self._http_thread = threading.Thread(
            target=self.http.serve_forever, daemon=True)
        self._http_thread.start()

        # SSDP responder: plain unicast UDP socket (tests inject its
        # address as upnp_ssdp_addr, so no multicast is involved).
        self._ssdp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._ssdp.bind(("127.0.0.1", 0))
        self.ssdp_addr = self._ssdp.getsockname()
        self._running = True
        self._ssdp_thread = threading.Thread(
            target=self._ssdp_loop, daemon=True)
        self._ssdp_thread.start()

    def close(self):
        self._running = False
        try:
            self._ssdp.close()
        except OSError:
            pass
        self.http.shutdown()
        self.http.server_close()

    # -- SSDP ---------------------------------------------------------------

    def _ssdp_loop(self):
        while self._running:
            try:
                data, peer = self._ssdp.recvfrom(65536)
            except OSError:
                return
            if not data.startswith(b"M-SEARCH"):
                continue
            resp = ("HTTP/1.1 200 OK\r\n"
                    "CACHE-CONTROL: max-age=120\r\n"
                    f"ST: {upnp.SEARCH_TARGET}\r\n"
                    f"LOCATION: http://127.0.0.1:{self.http_port}/desc.xml\r\n"
                    "\r\n").encode()
            try:
                self._ssdp.sendto(resp, peer)
            except OSError:
                return

    # -- description + SOAP --------------------------------------------------

    def _description(self):
        # Nested device tree like a real IGD (root → WANDevice →
        # WANConnectionDevice → WANIPConnection service).
        return f"""<?xml version="1.0"?>
<root xmlns="urn:schemas-upnp-org:device-1-0">
 <device>
  <deviceType>urn:schemas-upnp-org:device:InternetGatewayDevice:1</deviceType>
  <deviceList><device>
   <deviceType>urn:schemas-upnp-org:device:WANDevice:1</deviceType>
   <deviceList><device>
    <deviceType>urn:schemas-upnp-org:device:WANConnectionDevice:1</deviceType>
    <serviceList><service>
     <serviceType>{WAN_IP_1}</serviceType>
     <serviceId>urn:upnp-org:serviceId:WANIPConn1</serviceId>
     <controlURL>/ctl</controlURL>
     <eventSubURL>/evt</eventSubURL>
     <SCPDURL>/scpd.xml</SCPDURL>
    </service></serviceList>
   </device></deviceList>
  </device></deviceList>
 </device>
</root>"""

    @staticmethod
    def _args_of(body):
        root = ElementTree.fromstring(body)
        args = {}
        for elem in root.iter():
            name = _localname(elem.tag)
            if name.startswith("New"):
                args[name] = elem.text or ""
        return args

    @staticmethod
    def _ok(action, inner=""):
        return (f'<?xml version="1.0"?>'
                f'<s:Envelope xmlns:s='
                f'"http://schemas.xmlsoap.org/soap/envelope/">'
                f'<s:Body><u:{action}Response xmlns:u="{WAN_IP_1}">'
                f'{inner}</u:{action}Response></s:Body></s:Envelope>')

    _FAULT = ('<?xml version="1.0"?>'
              '<s:Envelope><s:Body><s:Fault>'
              '<detail><UPnPError><errorCode>718</errorCode>'
              '<errorDescription>ConflictInMappingEntry</errorDescription>'
              '</UPnPError></detail>'
              '</s:Fault></s:Body></s:Envelope>')

    def _soap(self, action, body):
        self.soap_actions.append(action)
        args = self._args_of(body)
        if action == "AddPortMapping":
            if self.fail_add:
                return 500, self._FAULT
            key = (args.get("NewProtocol", ""),
                   args.get("NewExternalPort", ""))
            self.mappings[key] = args
            return 200, self._ok(action)
        if action == "DeletePortMapping":
            key = (args.get("NewProtocol", ""),
                   args.get("NewExternalPort", ""))
            if key not in self.mappings:
                return 500, self._FAULT
            del self.mappings[key]
            return 200, self._ok(action)
        if action == "GetExternalIPAddress":
            return 200, self._ok(
                action,
                f"<NewExternalIPAddress>{self.external_ip}"
                f"</NewExternalIPAddress>")
        return 500, self._FAULT


@pytest.fixture()
def igd():
    f = FakeIGD()
    yield f
    f.close()


def _free_udp_port():
    with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_discover_finds_gateway(igd):
    gw = upnp.discover(timeout=2.0, ssdp_addr=igd.ssdp_addr)
    assert gw is not None
    assert gw.service_type == WAN_IP_1
    assert gw.control_url == f"http://127.0.0.1:{igd.http_port}/ctl"
    assert gw.local_ip == "127.0.0.1"


def test_discover_times_out_without_gateway():
    # A bound-but-silent endpoint: discovery must return None quickly.
    with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as silent:
        silent.bind(("127.0.0.1", 0))
        gw = upnp.discover(timeout=0.3, ssdp_addr=silent.getsockname())
    assert gw is None


def test_add_delete_mapping_and_external_ip(igd):
    gw = upnp.discover(timeout=2.0, ssdp_addr=igd.ssdp_addr)
    assert gw.add_port_mapping(7777, 7777, "UDP", description="test")
    assert igd.mappings[("UDP", "7777")]["NewInternalClient"] == "127.0.0.1"
    assert igd.mappings[("UDP", "7777")]["NewInternalPort"] == "7777"
    assert igd.mappings[("UDP", "7777")]["NewEnabled"] == "1"
    assert gw.get_external_ip() == "203.0.113.7"
    assert gw.delete_port_mapping(7777, "UDP")
    assert igd.mappings == {}
    # Deleting again is a SOAP fault → False, no exception.
    assert not gw.delete_port_mapping(7777, "UDP")


def test_add_mapping_failure_is_false():
    igd = FakeIGD(fail_add=True)
    try:
        gw = upnp.discover(timeout=2.0, ssdp_addr=igd.ssdp_addr)
        assert gw is not None
        assert not gw.add_port_mapping(7777, 7777, "UDP")
        assert igd.mappings == {}
    finally:
        igd.close()


def test_networking_maps_on_host_and_unmaps_on_close(igd):
    port = _free_udp_port()
    net = Networking()
    net.upnp_enabled = True
    net.upnp_timeout = 2.0
    net.upnp_ssdp_addr = igd.ssdp_addr
    try:
        # No one answers the election ping → become host → UPnP map.
        assert net.connect("127.0.0.1", port, handshake_timeout=0.2)
        assert net.is_host
        assert ("UDP", str(port)) in igd.mappings
        desc = igd.mappings[("UDP", str(port))]
        assert desc["NewPortMappingDescription"] == "softwarerenderer_tpu"
    finally:
        net.close()
    assert igd.mappings == {}          # unmapped on close
    assert "DeletePortMapping" in igd.soap_actions


def test_networking_upnp_disabled_by_default(igd):
    port = _free_udp_port()
    net = Networking()
    net.upnp_ssdp_addr = igd.ssdp_addr   # even with a gateway available
    try:
        assert net.connect("127.0.0.1", port, handshake_timeout=0.2)
        assert net.is_host
        assert igd.mappings == {}
        assert igd.soap_actions == []
    finally:
        net.close()
