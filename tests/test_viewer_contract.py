"""Static client<->server API contract for the viewer (round-5 VERDICT #6).

No JS engine exists in this image (CLAUDE.md), so the ~700-line inline
client can't be executed under test — but its contract with the server CAN
be checked statically: every `/api/...` literal the client fetches must
resolve to a route in `_Handler.do_GET`/`do_POST`, every server route must
be either referenced by the client or explicitly exempted here (so a rename
on either side fails this file), the `_CACHEABLE` prefixes must all be real
routes, and the script must scan as balanced JS (brackets, quotes,
template literals) so a truncated edit can't ship silently.
"""

import inspect
import re

import msv_tpu.viewer as V

# Server routes the inline client intentionally does NOT call:
#   /api/spec, /api/wav  - full-image endpoints (CLI/automation; the client
#                          always uses the cropped variants)
#   /api/colormap        - colormap export for CLI/automation (the page's
#                          colorbar uses /api/colorbar)
#   /api/stats           - profiling/observability endpoint (curl surface)
CLIENT_EXEMPT = {"/api/spec", "/api/wav", "/api/colormap", "/api/stats"}


def _client_endpoints():
    """/api/... literals the client can hit.

    Besides direct literals, the client builds some endpoints dynamically
    as `/api/${var}/...` where var was assigned from quoted name strings
    (e.g. `adaptive ? 'adaptive_crop' : 'spec_crop'`); every quoted word
    in the page that names a server route counts as a reference.
    """
    eps = {m.group(0) for m in re.finditer(r"/api/[a-z_]+", V._PAGE)}
    eps.discard("/api/")
    for m in re.finditer(r"/api/\$\{(\w+)\}", V._PAGE):
        var = m.group(1)
        # the variable's defining statement carries the candidate names
        for d in re.finditer(rf"(?:const|let|var)\s+{var}\s*=([^;]*);",
                             V._PAGE):
            for q in re.finditer(r"'([a-z_]+)'", d.group(1)):
                eps.add("/api/" + q.group(1))
    return eps


def _server_routes():
    src = (inspect.getsource(V._Handler.do_GET)
           + inspect.getsource(V._Handler.do_POST))
    routes = set()
    pat = r'url\.path(?:\s*==\s*|\.startswith\()\s*"(/api/[a-z_]+)'
    for m in re.finditer(pat, src):
        routes.add(m.group(1).rstrip("/"))
    return routes


def test_every_client_endpoint_has_a_server_route():
    client = _client_endpoints()
    server = _server_routes()
    assert client, "no /api/ literals found in the client page?"
    missing = sorted(client - server)
    assert not missing, (
        f"client fetches routes the server does not serve: {missing}")


def test_every_server_route_is_used_or_exempted():
    client = _client_endpoints()
    server = _server_routes()
    unused = sorted(server - client - CLIENT_EXEMPT)
    assert not unused, (
        f"server routes neither referenced by the client nor exempted in "
        f"CLIENT_EXEMPT: {unused}")
    stale = sorted(CLIENT_EXEMPT - server)
    assert not stale, f"CLIENT_EXEMPT lists routes that no longer exist: {stale}"
    over = sorted(CLIENT_EXEMPT & client)
    assert not over, f"CLIENT_EXEMPT lists routes the client now uses: {over}"


def test_cacheable_prefixes_are_real_routes():
    server = _server_routes()
    for prefix in V._CACHEABLE:
        assert prefix.rstrip("/") in server, (
            f"_CACHEABLE prefix {prefix!r} has no matching route")


def _strip_js_literals(js: str) -> str:
    """Remove string/template/comment contents, keeping structure chars.

    Template literals recurse through ${...}; the scanner tracks a mode
    stack so nested templates and braces inside expressions survive.
    Escapes (\\x) are consumed inside strings.  Returns JS with literal
    contents blanked, so bracket counting sees only code structure.
    """
    out = []
    # stack frames: [kind, brace_depth]; kind in
    # code | tmplexpr | squote | dquote | template | linec | blockc.
    # tmplexpr is code inside ${...}: its OWN braces nest (object
    # literals, arrow bodies), so only a depth-0 '}' ends the expression.
    mode = [["code", 0]]
    i = 0
    n = len(js)
    while i < n:
        c = js[i]
        kind = mode[-1][0]
        if kind in ("squote", "dquote", "template"):
            if c == "\\":
                i += 2
                continue
            if (kind == "squote" and c == "'") \
                    or (kind == "dquote" and c == '"') \
                    or (kind == "template" and c == "`"):
                mode.pop()
            elif kind == "template" and c == "$" and i + 1 < n \
                    and js[i + 1] == "{":
                mode.append(["tmplexpr", 0])
                out.append("{")
                i += 2
                continue
            elif c == "\n":
                out.append(c)  # keep line numbers aligned
            i += 1
            continue
        if kind == "linec":
            if c == "\n":
                mode.pop()
                out.append(c)
            i += 1
            continue
        if kind == "blockc":
            if c == "*" and i + 1 < n and js[i + 1] == "/":
                mode.pop()
                i += 2
                continue
            if c == "\n":
                out.append(c)
            i += 1
            continue
        # code / tmplexpr
        if c == "'":
            mode.append(["squote", 0])
        elif c == '"':
            mode.append(["dquote", 0])
        elif c == "`":
            mode.append(["template", 0])
        elif c == "/" and i + 1 < n and js[i + 1] == "/":
            mode.append(["linec", 0])
            i += 2
            continue
        elif c == "/" and i + 1 < n and js[i + 1] == "*":
            mode.append(["blockc", 0])
            i += 2
            continue
        elif c == "{":
            mode[-1][1] += 1
            out.append(c)
        elif c == "}":
            if kind == "tmplexpr" and mode[-1][1] == 0:
                mode.pop()  # back into the enclosing template literal
            else:
                mode[-1][1] -= 1
            out.append(c)
        else:
            out.append(c)
        i += 1
    assert [m[0] for m in mode] == ["code"], (
        f"unterminated literal/comment: stack={[m[0] for m in mode]}")
    return "".join(out)


def test_client_script_brackets_balance():
    m = re.search(r"<script>(.*)</script>", V._PAGE, re.S)
    assert m, "no <script> block in the page"
    code = _strip_js_literals(m.group(1))
    pairs = {")": "(", "]": "[", "}": "{"}
    stack = []
    line = 1
    for ch in code:
        if ch == "\n":
            line += 1
        elif ch in "([{":
            stack.append((ch, line))
        elif ch in ")]}":
            assert stack, f"unmatched {ch!r} at line {line}"
            top, tl = stack.pop()
            assert top == pairs[ch], (
                f"mismatched {ch!r} at line {line} (opened {top!r} "
                f"at line {tl})")
    assert not stack, f"unclosed brackets: {stack[-3:]}"
