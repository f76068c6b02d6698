package com.mongodb.client.model;

public final class ReplaceOptions {
    public boolean isUpsert = false;
    public ReplaceOptions() {}
    public ReplaceOptions upsert(boolean upsert) { this.isUpsert = upsert; return this; }
}
