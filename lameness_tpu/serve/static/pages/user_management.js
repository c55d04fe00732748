// UserManagement.tsx: user list, role/tier/active management, new-account
// creation (register + admin PATCH for privileged roles).
import {api, h, main, esc, when, table, toast} from "/static/app.js";

export default async function UserManagement() {
  let users;
  try { users = await api("/api/auth/users"); }
  catch (e) {
    return main.append(h(`<div class="panel">${esc(e.message)} (admin only)</div>`));
  }
  main.append(h(`<div class="panel"><h2>Users (${users.length})</h2>
    <div id="list"></div></div>
  <div class="panel"><h2>Create account</h2>
    <div class="row"><input id="nu" placeholder="username">
      <input id="ne" placeholder="email">
      <input id="np" placeholder="password" type="password">
      <select id="nr"><option>rater</option><option>researcher</option>
        <option>admin</option></select>
      <button class="action" id="ncreate">Create</button></div>
    <div class="dim">accounts are created as raters and promoted via the
      admin PATCH — self-registration cannot mint privileged roles</div></div>`));

  document.getElementById("list").innerHTML = table(users, [
    ["user", u => `<b>${esc(u.username)}</b>
      <div class="dim">${esc(u.email || "")}</div>`],
    ["role", u => `<select data-role="${u.id}">
      ${["rater", "researcher", "admin"].map(r =>
        `<option ${u.role === r ? "selected" : ""}>${r}</option>`).join("")}
      </select>`],
    ["tier", u => `<select data-tier="${u.id}">
      <option value="">—</option>${["gold", "silver", "bronze"].map(t =>
        `<option ${u.rater_tier === t ? "selected" : ""}>${t}</option>`).join("")}
      </select>`],
    ["active", u => `<button class="mini" data-act="${u.id}"
       data-v="${u.is_active ? 0 : 1}">${u.is_active ? "deactivate" : "activate"}</button>`],
    ["last login", u => `<span class="dim">${when(u.last_login)}</span>`],
  ]);

  const patch = async (id, body) => {
    try { await api(`/api/auth/users/${id}`, {method: "PATCH", json: body}); }
    catch (e) { toast(e.message, "bad"); return false; }
    toast("updated"); return true;
  };
  document.querySelectorAll("select[data-role]").forEach(s =>
    s.onchange = () => patch(s.dataset.role, {role: s.value}));
  document.querySelectorAll("select[data-tier]").forEach(s =>
    s.onchange = () => s.value && patch(s.dataset.tier, {rater_tier: s.value}));
  document.querySelectorAll("button[data-act]").forEach(b =>
    b.onclick = async () => {
      if (await patch(b.dataset.act, {is_active: +b.dataset.v}))
        window.go("users");
    });

  document.getElementById("ncreate").onclick = async () => {
    const [u, e, p] = ["nu", "ne", "np"].map(i =>
      document.getElementById(i).value.trim());
    const role = document.getElementById("nr").value;
    if (!u || !e || !p) return toast("username, email, password required", "warn");
    try {
      // admin-create sets the role atomically (POST /api/auth/users)
      await api("/api/auth/users",
                {json: {username: u, email: e, password: p, role}});
      toast(`created ${u} (${role})`); window.go("users");
    } catch (err) { toast(err.message, "bad"); }
  };
}
